"""Log-mel spectrogram front-end, designed for the TPU MXU.

TPU-first design notes
----------------------
The reference computes STFTs with an index-gather ``rolling_window`` followed
by a complex ``jnp.fft.fft`` over frames (/root/reference/vietTTS/nat/dsp.py:
11-101).  Gathers and complex FFTs map poorly onto TPU hardware.  Here:

* Framing is pure reshape/slice: when ``win_length`` is a multiple of
  ``hop_length`` (1024 = 4 x 256 in every supported config), the padded signal
  is cut into hop-sized blocks and each frame is a concatenation of ``r``
  consecutive blocks — zero gathers, zero data-dependent indexing.
* The windowed DFT is two real matmuls against precomputed
  ``cos``/``-sin`` basis matrices with the Hann window folded in — this is a
  [T, n_fft] @ [n_fft, n_fft/2+1] contraction that tiles directly onto the
  128x128 MXU.
* The mel projection is one more matmul.

Numerics match the reference pipeline (reflect padding of
``(n_fft - hop) / 2``, magnitude ``sqrt(re^2 + im^2 + 1e-9)``, Slaney-norm mel
filterbank, ``log(clip(mel, 1e-5))``), reference dsp.py:104-128.  The Slaney
filterbank is computed locally (librosa-compatible) — no librosa at runtime.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from viettts_tpu.config import DspConfig

# ---------------------------------------------------------------------------
# Mel filterbank (Slaney-style, librosa-compatible).
# ---------------------------------------------------------------------------


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape [n_mels, n_fft // 2 + 1].

    Slaney-normalized triangles on the Slaney mel scale — numerically
    identical to ``librosa.filters.mel(htk=False, norm="slaney")``, which is
    what the reference uses (dsp.py:108-112).
    """
    if fmax is None:
        fmax = sample_rate / 2
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = _mel_to_hz(
        np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: equal energy per channel.
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window — equals ``jnp.hanning(N + 1)[:-1]``."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _dft_basis(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis matrices, each [n_fft, n_fft // 2 + 1].

    ``frames @ cos_basis`` and ``frames @ sin_basis`` give the real and
    imaginary parts of the one-sided DFT of the Hann-windowed frames.
    """
    window = hann_window(win_length)
    pad = (n_fft - win_length) // 2
    if pad > 0:
        window = np.pad(window, (pad, pad))
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(1 + n_fft // 2, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


# ---------------------------------------------------------------------------
# Framing.
# ---------------------------------------------------------------------------


def frame_signal(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice a batch of signals [B, S] into frames [B, T, frame_length].

    Uses the reshape/concat fast path when ``frame_length % hop_length == 0``;
    falls back to a strided gather otherwise.
    """
    B, S = y.shape
    n_frames = (S - frame_length) // hop_length + 1
    if frame_length % hop_length == 0:
        ratio = frame_length // hop_length
        n_blocks = S // hop_length
        blocks = y[:, : n_blocks * hop_length].reshape(B, n_blocks, hop_length)
        parts = [blocks[:, i : i + n_frames] for i in range(ratio)]
        return jnp.concatenate(parts, axis=-1)
    idx = (
        np.arange(n_frames)[:, None] * hop_length
        + np.arange(frame_length)[None, :]
    )
    return y[:, idx]


# ---------------------------------------------------------------------------
# Spectrogram ops.
# ---------------------------------------------------------------------------


def _matmul_f32(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-f32 matmul: TPU MXU f32 'matmuls' default to bf16 passes, which
    is too coarse for spectrogram extraction feeding a training loss."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
    mag_eps: float = 1e-9,
) -> jax.Array:
    """Magnitude STFT of [B, S] -> [B, T, n_fft // 2 + 1].

    Hann window only (like reference dsp.py:46-49).  ``center=True`` pads by
    ``n_fft // 2`` on both sides like librosa.
    """
    cos_b, sin_b = _dft_basis(n_fft, win_length)
    if center:
        y = jnp.pad(y, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode)
    frames = frame_signal(y, n_fft, hop_length)
    real = _matmul_f32(frames, jnp.asarray(cos_b))
    imag = _matmul_f32(frames, jnp.asarray(sin_b))
    return jnp.sqrt(real * real + imag * imag + mag_eps)


class LogMelSpectrogram:
    """Waveform [B, S] (float in [-1, 1]) -> log-mel [B, S // hop, n_mels].

    Matches the reference ``MelFilter`` (dsp.py:104-128) and hifi-gan
    preprocessing: reflect pad by ``(n_fft - hop) / 2``, center=False STFT,
    Slaney mel, ``log(clip(mel, 1e-5))``.
    """

    def __init__(self, cfg: DspConfig):
        self.cfg = cfg
        self._melfb_t = mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.mel_dim, cfg.fmin, cfg.fmax
        ).T  # [n_freqs, n_mels]
        cos_b, sin_b = _dft_basis(cfg.n_fft, cfg.win_length)
        self._cos_b = cos_b
        self._sin_b = sin_b

    def __call__(self, y: jax.Array) -> jax.Array:
        cfg = self.cfg
        assert y.ndim == 2, "expected [B, S] waveforms"
        p = (cfg.n_fft - cfg.hop_length) // 2
        y = jnp.pad(y, ((0, 0), (p, p)), mode="reflect")
        frames = frame_signal(y, cfg.n_fft, cfg.hop_length)
        real = _matmul_f32(frames, jnp.asarray(self._cos_b))
        imag = _matmul_f32(frames, jnp.asarray(self._sin_b))
        mag = jnp.sqrt(real * real + imag * imag + cfg.mag_eps)
        mel = _matmul_f32(mag, jnp.asarray(self._melfb_t))
        return jnp.log(jnp.clip(mel, min=cfg.mel_min_clip))
