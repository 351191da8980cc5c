"""Single-utterance (B=1) vocoder route comparison: bf16 vs int8-dynamic
vs int8-static, full fused generator at the one-shot serving shape.

Measures SPEED only.  The inference_dtype default is a quality call made
on trained weights (scripts/validate_int8.py, benchmarks/int8_quality.json):
int8 is the fastest route at every batch size but degrades badly on
trained activation ranges, so the default is bfloat16.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_b1_vocoder.py [T]
"""

import sys
import time

import numpy as np

K = 16


def main(n_frames=1024):
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
    mel = jnp.asarray(rng.randn(1, n_frames, 80).astype(np.float32) * 0.5)
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

    scales = jax.jit(
        lambda m: generator_calibrate_int8(cfg, params, m)
    )(mel)

    routes = {
        "float32": dict(compute_dtype=jnp.float32),
        "bfloat16": dict(compute_dtype=jnp.bfloat16),
        "int8-dynamic": dict(compute_dtype=jnp.bfloat16, quantize_int8=True),
        "int8-static": dict(
            compute_dtype=jnp.bfloat16, quantize_int8=True, act_scales=scales
        ),
    }
    for name, kw in routes.items():
        step = jax.jit(
            lambda dep, kw=kw: generator_apply_fused(
                cfg, params, mel + dep * 0, **kw
            )[0, 0, 0]
        )
        t = amortized(step)
        print(
            f"B=1 T={n_frames} {name:13s}: {t*1e3:7.2f} ms "
            f"({n_frames*256/t/1e6:.1f} Msamples/s)",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
