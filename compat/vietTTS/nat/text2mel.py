"""Reference-compatible ``text2mel`` (
/root/reference/vietTTS/nat/text2mel.py:85-103).

Same signature (``lexicon_fn`` is a lexicon file path); backed by
viettts_tpu's cached Synthesizer, so repeated calls never reload
checkpoints or re-jit.

The shim serves through the ``float32`` vocoder route: the drop-in
``vietTTS`` surface promises reference parity (BASELINE ``<=1e-3``), so
it must not inherit viettts_tpu's quantized serving default.  Use the
viettts_tpu API directly for the bf16/int8 fast paths.
"""

import numpy as np

from vietTTS import PARITY_CFG
from viettts_tpu import infer as _infer


def text2mel(
    text: str, lexicon_fn=None, silence_duration: float = -1.0
) -> np.ndarray:
    synth = _infer.get_synthesizer(
        cfg=PARITY_CFG,
        **({"lexicon_file": lexicon_fn} if lexicon_fn else {}),
    )
    return synth.synthesize(text, silence_duration).mel


__all__ = ["text2mel"]
