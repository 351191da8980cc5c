"""Offline corpus denoiser.

The reference prepares the InfoRe corpus by running Microsoft's NSNet2
noise suppressor over every clip before alignment
(/root/reference/notebooks/denoise_infore_dataset.ipynb, cells 4-6).
This tool makes that step runnable without the notebook:

* If an NSNet2 ONNX model is supplied (``--nsnet2 model.onnx``) and
  onnxruntime is importable, it runs the same suppressor.
* Otherwise it falls back to first-party **spectral gating**: estimate a
  per-frequency noise floor from the quietest frames, then apply a soft
  (Wiener-like) magnitude mask and overlap-add resynthesis.  This is the
  standard stationary-noise reducer (the noisereduce recipe) and is good
  enough for studio-read corpora like InfoRe where the noise is a low,
  stationary hiss.

Host-side numpy on purpose: corpus prep is a one-off offline pass, and
keeping it off-device leaves the TPU free for training.

CLI::

    python -m viettts_tpu.tools.denoise -i wav_dir -o out_dir \
        [--strength 2.0] [--nsnet2 nsnet2.onnx]
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path
from typing import Optional

import numpy as np

from viettts_tpu.data.audio import read_wav, write_wav


def _stft(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """[S] -> [frames, n_fft//2+1] complex (hann, center-padded)."""
    window = np.hanning(n_fft + 1)[:-1]
    x = np.pad(x, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return np.fft.rfft(x[idx] * window, axis=-1)


def _istft(spec: np.ndarray, n_fft: int, hop: int, length: int) -> np.ndarray:
    """Inverse of :func:`_stft` via windowed overlap-add."""
    window = np.hanning(n_fft + 1)[:-1]
    frames = np.fft.irfft(spec, n=n_fft, axis=-1) * window
    out = np.zeros((spec.shape[0] - 1) * hop + n_fft, np.float64)
    norm = np.zeros_like(out)
    wsq = window * window
    for t in range(spec.shape[0]):
        out[t * hop : t * hop + n_fft] += frames[t]
        norm[t * hop : t * hop + n_fft] += wsq
    out = out / np.maximum(norm, 1e-8)
    return out[n_fft // 2 : n_fft // 2 + length]


def spectral_gate(
    wav: np.ndarray,
    sample_rate: int,
    n_fft: int = 1024,
    hop: int = 256,
    strength: float = 2.0,
    quiet_frac: float = 0.1,
    floor_db: float = -24.0,
) -> np.ndarray:
    """Stationary-noise spectral gating.

    The per-frequency noise floor is the mean spectrum of the quietest
    ``quiet_frac`` of frames by broadband energy (those frames ~ pure
    noise; estimating per-bin percentiles over *all* frames would
    misclassify sustained tones as noise).  Each bin is attenuated by a
    soft mask that approaches 1 above ``strength`` x floor and
    ``floor_db`` below it.
    """
    x = wav.astype(np.float64)
    scale = max(np.abs(x).max(), 1e-8)
    spec = _stft(x / scale, n_fft, hop)
    mag = np.abs(spec)
    energy = mag.mean(axis=1)
    k = max(1, int(len(energy) * quiet_frac))
    quiet = np.argsort(energy)[:k]
    noise = mag[quiet].mean(axis=0, keepdims=True)
    thresh = strength * np.maximum(noise, 1e-10)
    # Smooth sigmoid gate on the magnitude/threshold ratio (in ~6 dB).
    snr = mag / thresh
    gate = 1.0 / (1.0 + np.exp(-4.0 * (snr - 1.0)))
    min_gain = 10.0 ** (floor_db / 20.0)
    gain = min_gain + (1.0 - min_gain) * gate
    # Median-ish smoothing over time to avoid musical noise.
    g = gain
    g = (
        np.concatenate([g[:1], g[:-1]], axis=0)
        + g
        + np.concatenate([g[1:], g[-1:]], axis=0)
    ) / 3.0
    out = _istft(spec * g, n_fft, hop, len(x)) * scale
    return out.astype(np.float32)


def nsnet2_denoise(
    wav: np.ndarray, sample_rate: int, model_path: str | Path
) -> np.ndarray:
    """Run the NSNet2 ONNX suppressor (the reference notebook's model):
    log-power LSA features at 320-point hop, per-frame gain on the STFT.
    Requires onnxruntime and the published nsnet2 baseline model."""
    import onnxruntime as ort  # gated: not bundled in this container

    n_fft, hop = 512, 160  # NSNet2 baseline (16 kHz) frame setup
    x = wav.astype(np.float32) / 32768.0 if wav.dtype == np.int16 else wav
    spec = _stft(x.astype(np.float64), n_fft, hop)
    feat = np.log10(np.maximum(np.abs(spec) ** 2, 1e-12)).astype(np.float32)
    sess = ort.InferenceSession(str(model_path))
    gain = sess.run(None, {sess.get_inputs()[0].name: feat[None]})[0][0]
    out = _istft(spec * np.clip(gain, 0.0, 1.0), n_fft, hop, len(x))
    return out.astype(np.float32)


def denoise_file(
    src: Path,
    dst: Path,
    strength: float = 2.0,
    nsnet2: Optional[Path] = None,
) -> None:
    sr, data = read_wav(src)
    if data.ndim > 1:
        data = data.mean(axis=-1)
    x = data.astype(np.float32)
    if data.dtype == np.int16:
        x = x / 32768.0
    if nsnet2 is not None:
        y = nsnet2_denoise(x, sr, nsnet2)
    else:
        y = spectral_gate(x, sr, strength=strength)
    write_wav(dst, np.clip(y, -1.0, 1.0), sr)


def main(argv=None):
    parser = ArgumentParser(description="Denoise a directory of WAV files")
    parser.add_argument("-i", "--input-dir", type=Path, required=True)
    parser.add_argument("-o", "--output-dir", type=Path, required=True)
    parser.add_argument(
        "--strength", type=float, default=2.0,
        help="noise-floor multiplier for the spectral gate",
    )
    parser.add_argument(
        "--nsnet2", type=Path, default=None,
        help="optional NSNet2 ONNX model (needs onnxruntime)",
    )
    args = parser.parse_args(argv)
    args.output_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(args.input_dir.glob("*.wav"))
    if not files:
        raise SystemExit(f"no .wav files in {args.input_dir}")
    for i, f in enumerate(files):
        denoise_file(f, args.output_dir / f.name, args.strength, args.nsnet2)
        if (i + 1) % 100 == 0 or i + 1 == len(files):
            print(f"{i + 1}/{len(files)} denoised")


if __name__ == "__main__":
    main()
