"""Reference-compatible ``text2mel`` (
/root/reference/vietTTS/nat/text2mel.py:85-103).

Same signature (``lexicon_fn`` is a lexicon file path); backed by
viettts_tpu's cached Synthesizer, so repeated calls never reload
checkpoints or re-jit.
"""

import numpy as np

from viettts_tpu import infer as _infer


def text2mel(
    text: str, lexicon_fn=None, silence_duration: float = -1.0
) -> np.ndarray:
    return _infer.text2mel(
        text, lexicon_file=lexicon_fn, silence_duration=silence_duration
    )


__all__ = ["text2mel"]
