"""Perceptual audio metrics for vocoder validation.

The reference has no quantitative vocoder-quality tracking at all (its
de-facto validation is listening to quick_start.sh output); upstream
hifi-gan tracks a validation mel error.  Mel-cepstral distortion (MCD)
is the standard compact spectral-envelope distance for vocoder
resynthesis: cepstra decorrelate the mel bands, so a broadband level
error and a formant error are weighted comparably, unlike raw mel L1.

Used by scripts/validate_gan.py (trend over training) and available for
ad-hoc A/B checks.  All functions are jit-friendly (pure jnp, static
shapes).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp


@lru_cache(maxsize=8)
def _dct_matrix(n_mels: int, n_coeffs: int) -> np.ndarray:
    """Orthonormal DCT-II basis [n_mels, n_coeffs] (scipy.fftpack.dct
    norm='ortho' convention), mapping log-mel bands to cepstra."""
    k = np.arange(n_coeffs)[None, :]
    m = np.arange(n_mels)[:, None]
    basis = np.cos(np.pi * k * (2 * m + 1) / (2 * n_mels))
    basis *= np.sqrt(2.0 / n_mels)
    basis[:, 0] *= np.sqrt(0.5)
    return basis.astype(np.float32)


def mel_cepstra(log_mel: jnp.ndarray, n_coeffs: int = 13) -> jnp.ndarray:
    """Log-mel [..., T, n_mels] -> cepstra [..., T, n_coeffs] (c0 = energy
    term included; MCD drops it)."""
    basis = jnp.asarray(_dct_matrix(log_mel.shape[-1], n_coeffs))
    return log_mel @ basis


def mel_cepstral_distortion(
    log_mel_ref: jnp.ndarray,
    log_mel_gen: jnp.ndarray,
    n_coeffs: int = 13,
) -> jnp.ndarray:
    """MCD in dB between time-aligned log-mel spectrograms [..., T, M]:

        MCD = (10 / ln 10) * sqrt(2) * mean_t ||c_ref[t] - c_gen[t]||_2

    over cepstral coefficients 1..n_coeffs-1 (c0/energy excluded, the
    standard convention).  Vocoder resynthesis is sample-aligned with its
    conditioning, so no DTW is needed.  Typical values: < 1 dB is near
    transparent; good neural vocoders land ~2-5 dB on held-out speech.
    """
    c_r = mel_cepstra(log_mel_ref, n_coeffs)[..., 1:]
    c_g = mel_cepstra(log_mel_gen, n_coeffs)[..., 1:]
    dist = jnp.sqrt(jnp.sum(jnp.square(c_r - c_g), axis=-1) + 1e-12)
    return (10.0 / jnp.log(10.0)) * jnp.sqrt(2.0) * jnp.mean(dist)
