"""Inference API.

``Synthesizer`` is the primary interface (cached models, bucketed shapes,
batch mode).  ``text2mel`` / ``mel2wave`` mirror the reference's
free-function API (text2mel.py:85, mel2wave.py:20) on top of a lazily
constructed global Synthesizer, cached per constructor-kwargs so repeated
calls (with or without a lexicon) never re-jit.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from viettts_tpu.infer.pipeline import SynthesisResult, Synthesizer

_CACHE: Dict[Tuple, Synthesizer] = {}


def _cache_key(kwargs: dict) -> Tuple:
    return tuple(sorted((k, str(v)) for k, v in kwargs.items()))


def get_synthesizer(**kwargs) -> Synthesizer:
    """Return a (cached) Synthesizer.  Calls with the same kwargs reuse the
    same instance — including its compiled programs.  The no-kwargs default
    instance is created on first use and shared thereafter."""
    key = _cache_key(kwargs)
    synth = _CACHE.get(key)
    if synth is None:
        synth = _CACHE[key] = Synthesizer(**kwargs)
    return synth


def clear_synthesizer_cache() -> None:
    _CACHE.clear()


def text2mel(
    text: str,
    lexicon_file=None,
    silence_duration: float = -1.0,
) -> np.ndarray:
    """Text -> log-mel [T, mel_dim] (reference-compatible free function)."""
    synth = get_synthesizer(
        **({"lexicon_file": lexicon_file} if lexicon_file else {})
    )
    return synth.synthesize(text, silence_duration).mel


def mel2wave(mel: np.ndarray) -> np.ndarray:
    """Log-mel [T, mel_dim] or [1, T, mel_dim] -> waveform [S] float32."""
    synth = get_synthesizer()
    mel = np.asarray(mel)
    if mel.ndim == 2:
        mel = mel[None]
    return synth.vocode(mel)[0]


__all__ = [
    "Synthesizer",
    "SynthesisResult",
    "get_synthesizer",
    "clear_synthesizer_cache",
    "text2mel",
    "mel2wave",
]
