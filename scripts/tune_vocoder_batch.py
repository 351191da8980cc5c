"""One-off: find the batch-size crossover for the ConvT-upsample fusion.

The fused ConvT+MRF Pallas route wins at small batch (B=1: 11.6 vs
14.7 ms) but loses at B=64 (433 vs 394 ms) and OOMs unchunked; this
sweeps batch sizes on both routes so `generator_apply_fused` can pick a
measured threshold.

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

    for batch in (1, 4, 8, 16, 32, 64):
        mel = mel64[:batch]
        row = []
        for fuse_up in (True, False):
            # chunk only when the fused-ConvT program would blow HBM
            chunk = 16 if (fuse_up and batch > 16) else batch
            try:
                f = jax.jit(
                    lambda m, c=chunk, fu=fuse_up: generator_apply_fused(
                        cfg, params, m, max_chunk_batch=c, fuse_upsample=fu
                    )
                )
                t = amortized(lambda s: f(mel + s * 0.0)[0, 0, 0])
                row.append(f"{'convT' if fuse_up else 'noconvT':8s} {t * 1e3:8.2f} ms")
            except Exception as e:
                row.append(f"{'convT' if fuse_up else 'noconvT':8s} FAILED {type(e).__name__}")
        print(f"B={batch:3d}  " + "  |  ".join(row))


if __name__ == "__main__":
    main()
