"""Tuning sweeps for the int8 vocoder serving route.

1. VMEM tile budget: the int8 A-matrices are half the bf16 size, which
   moves the resident-weights/tile-size tradeoff (docs/BUILD_NOTES.md
   round-3 note tuned 48 MB for bf16).  Measured (v5e, B=64 T=768):
   24 MB 231.6 ms / 48 MB 215.9 ms / 96 MB 215.4 ms — 48 stays right.
2. Dynamic vs static (calibrated) activation scales: static removes the
   per-conv amax reduce from the kernel's critical path
   (``generator_calibrate_int8`` + ``fused_mrf(act_scales=)``).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_int8_tile.py
"""

import os
import time

import numpy as np

BATCH, N_FRAMES, K = 64, 768, 8


def main():
    import jax
    import jax.numpy as jnp

    from viettts_tpu.config import Config
    from viettts_tpu.models import Generator
    from viettts_tpu.models.hifigan import (
        generator_apply_fused,
        generator_calibrate_int8,
    )

    cfg = Config().hifigan
    gen = Generator(cfg)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(BATCH, N_FRAMES, 80).astype(np.float32) * 0.5)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)["params"]

    def amortized(step, iters=K, trials=3):
        def chain(n):
            s = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                s = step(s)
            _ = float(s)
            return time.perf_counter() - t0

        chain(1)
        floor = min(chain(0) for _ in range(trials))
        total = min(chain(iters) for _ in range(trials))
        return max(total - floor, 0.0) / iters

    def report(name, step, wav_ref=None):
        t = amortized(step)
        sps = BATCH * N_FRAMES * 256 / t
        line = f"{name:28s}: {t*1e3:8.2f} ms  ({sps/1e6:.1f} Msamples/s)"
        print(line, flush=True)
        return t

    # f32 reference waveform for quality bounds (on a held-out mel).
    melq = jnp.asarray(rng.randn(2, N_FRAMES, 80).astype(np.float32) * 0.5)
    wav_ref = np.asarray(
        jax.jit(lambda m: generator_apply_fused(cfg, params, m))(melq),
        np.float32,
    )
    rms = float(np.sqrt((wav_ref ** 2).mean()))

    def quality(route):
        wav = np.asarray(jax.jit(route)(melq), np.float32)
        return float(np.sqrt(((wav - wav_ref) ** 2).mean()) / rms)

    for mb in (48,):
        os.environ["VIETTTS_MRF_TILE_MB"] = str(mb)

        step_dyn = jax.jit(
            lambda dep: generator_apply_fused(
                cfg, params, mel + dep * 0,
                compute_dtype=jnp.bfloat16, quantize_int8=True,
            )[0, 0, 0]
        )
        report(f"tile={mb} dynamic", step_dyn)
        q = quality(
            lambda m: generator_apply_fused(
                cfg, params, m, compute_dtype=jnp.bfloat16,
                quantize_int8=True,
            )
        )
        print(f"  dynamic rel-RMS vs f32   : {q:.4%}", flush=True)

        # Calibrate on the BENCH mel, measure quality on the held-out mel
        # (so the bound reflects out-of-calibration serving inputs).
        scales = jax.jit(
            lambda m: generator_calibrate_int8(cfg, params, m)
        )(mel[:8])
        step_st = jax.jit(
            lambda dep: generator_apply_fused(
                cfg, params, mel + dep * 0,
                compute_dtype=jnp.bfloat16, quantize_int8=True,
                act_scales=scales,
            )[0, 0, 0]
        )
        report(f"tile={mb} static", step_st)
        q = quality(
            lambda m: generator_apply_fused(
                cfg, params, m, compute_dtype=jnp.bfloat16,
                quantize_int8=True, act_scales=scales,
            )
        )
        print(f"  static rel-RMS vs f32    : {q:.4%}", flush=True)


if __name__ == "__main__":
    main()
