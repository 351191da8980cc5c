"""Perceptual metric (MCD) sanity: identity, energy-invariance, scaling."""

import numpy as np

import jax.numpy as jnp

from viettts_tpu.utils.metrics import mel_cepstral_distortion, mel_cepstra


def test_mcd_identity_is_zero():
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 50, 80))
    assert float(mel_cepstral_distortion(mel, mel)) < 1e-3


def test_mcd_ignores_broadband_gain():
    """A constant log-mel offset (pure gain) lands entirely in c0, which
    MCD excludes by convention."""
    mel = jnp.asarray(np.random.RandomState(1).randn(1, 40, 80))
    assert float(mel_cepstral_distortion(mel, mel + 3.0)) < 1e-3


def test_mcd_scales_linearly_with_spectral_error():
    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(1, 40, 80))
    shaped = jnp.asarray(rng.randn(1, 40, 80))  # non-constant error
    d1 = float(mel_cepstral_distortion(mel, mel + 0.1 * shaped))
    d2 = float(mel_cepstral_distortion(mel, mel + 0.2 * shaped))
    assert d1 > 0.01
    np.testing.assert_allclose(d2 / d1, 2.0, rtol=1e-3)


def test_cepstra_match_scipy_dct():
    scipy = __import__("pytest").importorskip("scipy")
    from scipy.fftpack import dct

    mel = np.random.RandomState(3).randn(7, 80).astype(np.float32)
    got = np.asarray(mel_cepstra(jnp.asarray(mel), n_coeffs=13))
    want = dct(mel, type=2, norm="ortho", axis=-1)[:, :13]
    np.testing.assert_allclose(got, want, atol=1e-4)
