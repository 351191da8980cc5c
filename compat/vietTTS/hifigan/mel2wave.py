"""Reference-compatible ``mel2wave``
(/root/reference/vietTTS/hifigan/mel2wave.py:20-41), backed by
viettts_tpu's jitted fused-MRF vocoder (the reference runs un-jitted).

Serves through the ``float32`` route — see vietTTS.PARITY_CFG.
"""

import numpy as np

from vietTTS import PARITY_CFG
from viettts_tpu import infer as _infer


def mel2wave(mel: np.ndarray) -> np.ndarray:
    synth = _infer.get_synthesizer(cfg=PARITY_CFG)
    mel = np.asarray(mel)
    if mel.ndim == 2:
        mel = mel[None]
    return synth.vocode(mel)[0]


__all__ = ["mel2wave"]
