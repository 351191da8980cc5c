"""Reference-compatible ``mel2wave``
(/root/reference/vietTTS/hifigan/mel2wave.py:20-41), backed by
viettts_tpu's jitted fused-MRF vocoder (the reference runs un-jitted).
"""

import numpy as np

from viettts_tpu import infer as _infer


def mel2wave(mel: np.ndarray) -> np.ndarray:
    return _infer.mel2wave(mel)


__all__ = ["mel2wave"]
