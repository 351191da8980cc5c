"""Find the best vocoder serving route per batch size: compute dtype
(f32 vs bf16), ConvT-upsample fusion, and the C=128-stage fused-MRF batch
cap (``fused_max_batch``; None lifts it — viable since the kernel keeps
its packed weights VMEM-resident instead of re-streaming them per
(batch, tile) grid program).

Also reports the bf16-vs-f32 quality delta (max |wave err| and mean
|wave err|) so the serving default is a measured decision.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_vocoder_batch.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models import Generator
from viettts_tpu.models.hifigan import generator_apply_fused

N_FRAMES, K = 768, 8


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


def main():
    cfg = Config().hifigan
    gen = Generator(cfg)
    mel64 = jnp.asarray(
        np.random.RandomState(0).randn(64, N_FRAMES, 80).astype(np.float32)
    )
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel64[:1])["params"]

    # quality: bf16 route vs f32 route on the same params/mel
    f32 = generator_apply_fused(cfg, params, mel64[:4], fuse_upsample=False)
    b16 = generator_apply_fused(
        cfg, params, mel64[:4], fuse_upsample=False,
        compute_dtype=jnp.bfloat16, fused_max_batch=None,
    )
    d = np.abs(np.asarray(f32, np.float32) - np.asarray(b16, np.float32))
    print(f"bf16 vs f32: max|dwave|={d.max():.3e} mean|dwave|={d.mean():.3e} "
          f"(wave rms={float(jnp.sqrt(jnp.mean(f32**2))):.3e})")

    variants = [
        ("f32 noconvT fmb=8 (r2 default)", dict(fuse_upsample=False, fused_max_batch=8)),
        ("f32 noconvT fmb=None", dict(fuse_upsample=False, fused_max_batch=None)),
        ("bf16 noconvT fmb=8", dict(fuse_upsample=False, fused_max_batch=8, compute_dtype=jnp.bfloat16)),
        ("bf16 noconvT fmb=None", dict(fuse_upsample=False, fused_max_batch=None, compute_dtype=jnp.bfloat16)),
        ("bf16 convT fmb=None", dict(fuse_upsample=True, fused_max_batch=None, compute_dtype=jnp.bfloat16)),
    ]

    for batch in (1, 8, 16, 32, 64):
        mel = mel64[:batch]
        audio_s = batch * N_FRAMES * 256 / 16000
        rows = []
        for name, kw in variants:
            kw = dict(kw)
            if kw.get("fuse_upsample") and batch > 16:
                kw["max_chunk_batch"] = 16
            try:
                f = jax.jit(
                    lambda m, kw=kw: generator_apply_fused(cfg, params, m, **kw)
                )
                t = amortized(lambda s: f(mel + s * 0.0)[0, 0, 0])
                rows.append(f"{name:32s} {t * 1e3:8.2f} ms ({audio_s / t:7.0f} s-audio/s)")
            except Exception as e:
                rows.append(f"{name:32s} FAILED {type(e).__name__}: {str(e)[:120]}")
        print(f"B={batch:3d}")
        for r in rows:
            print("   " + r)


if __name__ == "__main__":
    main()
