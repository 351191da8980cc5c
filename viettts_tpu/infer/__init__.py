"""Inference API.

``Synthesizer`` is the primary interface (cached models, bucketed shapes,
batch mode).  ``text2mel`` / ``mel2wave`` mirror the reference's
free-function API (text2mel.py:85, mel2wave.py:20) on top of a lazily
constructed global Synthesizer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from viettts_tpu.infer.pipeline import SynthesisResult, Synthesizer

_GLOBAL: Optional[Synthesizer] = None


def get_synthesizer(**kwargs) -> Synthesizer:
    global _GLOBAL
    if _GLOBAL is None or kwargs:
        _GLOBAL = Synthesizer(**kwargs)
    return _GLOBAL


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
    import jax.numpy as jnp

    synth = get_synthesizer()
    mel = np.asarray(mel)
    if mel.ndim == 2:
        mel = mel[None]
    wav = synth._vocode(synth._hifigan_vars, jnp.asarray(mel))
    return np.asarray(wav[0, :, 0])


__all__ = [
    "Synthesizer",
    "SynthesisResult",
    "get_synthesizer",
    "text2mel",
    "mel2wave",
]
