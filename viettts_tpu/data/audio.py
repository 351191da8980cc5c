"""WAV read/write without soundfile/scipy dependencies at the call site.

The reference uses scipy.io.wavfile for reading (data_loader.py:6,110) and
soundfile for writing (synthesizer.py:6,39); neither extra dependency is
needed for 16-bit PCM, so this is a small first-party codec (scipy is still
used for reading when available, for robustness with odd WAV variants).
"""

from __future__ import annotations

import struct
import wave
from pathlib import Path
from typing import Tuple

import numpy as np


def read_wav(path: str | Path) -> Tuple[int, np.ndarray]:
    """Read a WAV file -> (sample_rate, int16 samples [S] or [S, C])."""
    try:
        from scipy.io import wavfile

        sr, data = wavfile.read(str(path))
        return int(sr), np.asarray(data)
    except Exception:
        with wave.open(str(path), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(n)
        if width != 2:
            raise ValueError(f"only 16-bit PCM supported, got width={width}")
        data = np.frombuffer(raw, dtype="<i2")
        if ch > 1:
            data = data.reshape(-1, ch)
        return sr, data


def write_wav(path: str | Path, data: np.ndarray, sample_rate: int) -> None:
    """Write mono 16-bit PCM.  Float input in [-1, 1] is converted."""
    data = np.asarray(data)
    if data.dtype.kind == "f":
        data = np.clip(data, -1.0, 1.0)
        data = (data * 32767.0).astype("<i2")
    elif data.dtype != np.int16:
        data = data.astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(data.tobytes())
