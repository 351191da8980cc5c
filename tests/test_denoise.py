"""Denoise tool tests: spectral gate suppresses stationary noise while
keeping the signal; STFT/iSTFT round-trips; the CLI processes a dir."""

import numpy as np

from viettts_tpu.data.audio import read_wav, write_wav
from viettts_tpu.tools.denoise import _istft, _stft, main, spectral_gate

SR = 16000


def test_stft_istft_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(SR).astype(np.float64) * 0.3
    spec = _stft(x, 1024, 256)
    y = _istft(spec, 1024, 256, len(x))
    np.testing.assert_allclose(y, x, atol=1e-8)


def _tone_plus_noise(seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(SR * 2) / SR
    tone = 0.5 * np.sin(2 * np.pi * 220 * t)
    tone[: SR // 2] = 0.0  # leading "silence" region (noise only)
    noise = rng.randn(len(t)) * 0.02
    return (tone + noise).astype(np.float32), tone


def test_spectral_gate_reduces_noise_keeps_signal():
    noisy, clean = _tone_plus_noise()
    out = spectral_gate(noisy, SR)
    sil = slice(0, SR // 2 - 1024)
    act = slice(SR // 2 + 1024, SR)
    # noise-only region attenuated by at least ~8 dB
    assert np.std(out[sil]) < 0.45 * np.std(noisy[sil])
    # tone region keeps most of its energy
    assert np.std(out[act]) > 0.8 * np.std(noisy[act])
    # and the result is closer to the clean signal than the input was
    assert np.mean((out - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_denoise_cli(tmp_path):
    noisy, _ = _tone_plus_noise()
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    for i in range(2):
        write_wav(src / f"u{i}.wav", noisy, SR)
    main(["-i", str(src), "-o", str(dst)])
    for i in range(2):
        sr, data = read_wav(dst / f"u{i}.wav")
        assert sr == SR and len(data) == len(noisy)
