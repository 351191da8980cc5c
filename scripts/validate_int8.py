"""int8 serving-route quality on TRAINED weights (VERDICT round-4 #1a).

Round 4 shipped int8 as the default vocoder route with a quality bound
measured on a randomly-initialized generator — whose tanh output is
near-silence, so the bound said nothing about trained weight/activation
ranges.  This script measures the bound that matters: load a TRAINED
generator checkpoint (the framework's own GAN run by default, or a
converted reference ``g_01140000`` when present), vocode REAL log-mels
(ground-truth audio from the training-corpus distribution plus the
never-trained held-out probe clip), and compare the static-int8 serving
route against the float32 route on the resulting waveforms:

* waveform relative RMS error + max-abs error (per clip and aggregate)
* MCD (dB) between the f32-route and int8-route re-analyzed mels —
  the perceptual distance the quantization itself introduces

Calibration mirrors serving (Synthesizer.calibrate_int8): per-conv
amaxes tree-maxed over a multi-clip calibration set DISJOINT from the
eval clips, widened by the 1.25x margin.  Results ->
benchmarks/int8_quality.json (the authoritative int8 quality artifact;
scripts/bench_batch.py's random-weights figure is a route sanity check
only).

Usage:
    PYTHONPATH=.:$PYTHONPATH python scripts/validate_int8.py \
        [--ckpt /tmp/gan_ckpt/hifigan_latest_ckpt.pickle] [--n-eval 6]

Reference contract being tested: the ≤1e-3 parity target applies to the
float32 route (BASELINE.md; /root/reference/vietTTS/hifigan/mel2wave.py:20-41
is f32 end to end); int8 is a serving speed/quality trade whose cost
this artifact quantifies.
"""

import argparse
import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models import Generator
from viettts_tpu.models.hifigan import (
    generator_apply_fused,
    generator_calibrate_int8,
    generator_int8_clip_stats,
)
from viettts_tpu.ops.mel import LogMelSpectrogram
from viettts_tpu.train.checkpoint import load_variables
from viettts_tpu.utils.metrics import mel_cepstral_distortion

SR = 16000
OUT = Path("benchmarks")


def _corpus_mels(cfg, n_eval: int):
    """Real mels: ground-truth audio from the GAN corpus distribution.

    Eval set = the held-out probe clip (seed 12345, never trained on)
    plus the LAST ``n_eval - 1`` corpus clips; calibration set = the
    FIRST 4 corpus clips (disjoint from eval).
    """
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from validate_gan import heldout_clip, synth_corpus, _synth_clip  # noqa: F401

    corpus = Path("/tmp/gan_corpus")
    corpus.mkdir(exist_ok=True)
    if len(list(corpus.glob("*.wav"))) < 48:
        synth_corpus(corpus)

    from viettts_tpu.data.audio import read_wav

    mel_fn = LogMelSpectrogram(cfg.dsp)
    jitted = jax.jit(lambda w: mel_fn(w[None]))
    hop = cfg.dsp.hop_length

    def mel_of(w: np.ndarray):
        w = w[: len(w) // hop * hop].astype(np.float32)
        return jitted(jnp.asarray(w))

    files = sorted(corpus.glob("*.wav"))
    calib_files, eval_files = files[:4], files[-(n_eval - 1):]

    def load(f):
        _, y = read_wav(f)
        return y.astype(np.float32) / 2**15

    calib = [mel_of(load(f)) for f in calib_files]
    evals = [("heldout_seed12345", mel_of(heldout_clip()))] + [
        (f.stem, mel_of(load(f))) for f in eval_files
    ]
    return calib, evals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ckpt", type=Path,
        default=Path("/tmp/gan_ckpt/hifigan_latest_ckpt.pickle"),
        help="trained generator checkpoint (inference/folded format)",
    )
    ap.add_argument("--n-eval", type=int, default=6)
    ap.add_argument("--margin", type=float, default=1.25)
    args = ap.parse_args()

    cfg = Config()
    variables = load_variables(args.ckpt, "hifigan")
    params = variables["params"]
    gen = Generator(cfg.hifigan, use_wn=False)

    calib_mels, eval_mels = _corpus_mels(cfg, args.n_eval)

    # --- serving-exact calibration: tree-max over clips, then margin ---
    calib_fn = jax.jit(
        lambda m: generator_calibrate_int8(cfg.hifigan, params, m)
    )
    scales = calib_fn(calib_mels[0])
    for m in calib_mels[1:]:
        scales = jax.tree.map(jnp.maximum, scales, calib_fn(m))
    scales = jax.tree.map(lambda s: s * args.margin, scales)

    interpret = jax.default_backend() == "cpu"
    f32_route = jax.jit(gen.apply)
    bf16_route = jax.jit(
        lambda m: generator_apply_fused(
            cfg.hifigan, params, m, interpret=interpret,
            compute_dtype=jnp.bfloat16,
        )
    )
    int8_route = jax.jit(
        lambda m: generator_apply_fused(
            cfg.hifigan, params, m, interpret=interpret,
            compute_dtype=jnp.bfloat16, quantize_int8=True,
            act_scales=scales,
        )
    )
    int8_dyn_route = jax.jit(
        lambda m: generator_apply_fused(
            cfg.hifigan, params, m, interpret=interpret,
            compute_dtype=jnp.bfloat16, quantize_int8=True,
        )
    )
    mel_fn = LogMelSpectrogram(cfg.dsp)
    mcd_fn = jax.jit(
        lambda a, b: mel_cepstral_distortion(
            mel_fn(a[..., 0]), mel_fn(b[..., 0])
        )
    )
    clip_fn = jax.jit(
        lambda m: generator_int8_clip_stats(cfg.hifigan, params, m, scales)
    )

    per_clip = []
    for name, mel in eval_mels:
        w_f32 = np.asarray(f32_route(variables, mel), np.float64)
        w_bf16 = np.asarray(bf16_route(mel), np.float64)
        w_int8 = np.asarray(int8_route(mel), np.float64)
        w_dyn = np.asarray(int8_dyn_route(mel), np.float64)
        f32_rms = max(np.sqrt((w_f32**2).mean()), 1e-12)

        def rel_rms_of(w):
            return float(np.sqrt(((w - w_f32) ** 2).mean()) / f32_rms)

        def mcd_of(w):
            return float(mcd_fn(jnp.asarray(w_f32, jnp.float32),
                                jnp.asarray(w, jnp.float32)))

        fracs = clip_fn(mel)
        max_clip = float(max(float(np.max(v)) for v in fracs.values()))
        per_clip.append({
            "clip": name,
            "rel_rms_vs_f32": rel_rms_of(w_int8),
            "bf16_rel_rms_vs_f32": rel_rms_of(w_bf16),
            "int8_dynamic_rel_rms_vs_f32": rel_rms_of(w_dyn),
            "max_abs_err": float(np.abs(w_int8 - w_f32).max()),
            "f32_rms": float(f32_rms),
            "mcd_db_int8_vs_f32": mcd_of(w_int8),
            "mcd_db_bf16_vs_f32": mcd_of(w_bf16),
            "mcd_db_int8_dynamic_vs_f32": mcd_of(w_dyn),
            "max_clip_fraction": max_clip,
        })
        c = per_clip[-1]
        print(f"{name:>24s}  int8 rel_rms {c['rel_rms_vs_f32']:.5f} "
              f"mcd {c['mcd_db_int8_vs_f32']:.3f} dB | "
              f"dyn {c['int8_dynamic_rel_rms_vs_f32']:.5f} "
              f"mcd {c['mcd_db_int8_dynamic_vs_f32']:.3f} dB | "
              f"bf16 rel_rms {c['bf16_rel_rms_vs_f32']:.5f} "
              f"mcd {c['mcd_db_bf16_vs_f32']:.3f} dB | "
              f"clip_frac {max_clip:.2e}")

    rel = [c["rel_rms_vs_f32"] for c in per_clip]
    mcds = [c["mcd_db_int8_vs_f32"] for c in per_clip]
    rel_bf = [c["bf16_rel_rms_vs_f32"] for c in per_clip]
    mcds_bf = [c["mcd_db_bf16_vs_f32"] for c in per_clip]
    result = {
        "ckpt": str(args.ckpt),
        "weights": "TRAINED (framework GAN run)",
        "backend": jax.default_backend(),
        "calibration": {
            "n_clips": len(calib_mels),
            "margin": args.margin,
            "disjoint_from_eval": True,
        },
        "rel_rms_vs_f32_mean": float(np.mean(rel)),
        "rel_rms_vs_f32_max": float(np.max(rel)),
        "mcd_db_int8_vs_f32_mean": float(np.mean(mcds)),
        "mcd_db_int8_vs_f32_max": float(np.max(mcds)),
        "bf16_rel_rms_vs_f32_mean": float(np.mean(rel_bf)),
        "bf16_rel_rms_vs_f32_max": float(np.max(rel_bf)),
        "mcd_db_bf16_vs_f32_mean": float(np.mean(mcds_bf)),
        "mcd_db_bf16_vs_f32_max": float(np.max(mcds_bf)),
        "int8_dynamic_rel_rms_vs_f32_mean": float(np.mean(
            [c["int8_dynamic_rel_rms_vs_f32"] for c in per_clip])),
        "mcd_db_int8_dynamic_vs_f32_mean": float(np.mean(
            [c["mcd_db_int8_dynamic_vs_f32"] for c in per_clip])),
        "max_clip_fraction": max(c["max_clip_fraction"] for c in per_clip),
        "per_clip": per_clip,
    }
    OUT.mkdir(exist_ok=True)
    with open(OUT / "int8_quality.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "per_clip"},
                     indent=1))


if __name__ == "__main__":
    main()
