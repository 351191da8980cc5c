"""Fused-Pallas vs lax.scan AR decode across batch sizes (real TPU).

Calibrates the pipeline's fused-decode batch gate: the fused kernel keeps
all decoder weights VMEM-resident and streams gate chunks; the scan path
re-reads weights per step but batches its matmuls.  Prints per-batch
timings and the crossover.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/bench_ar.py [frames]
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models import AcousticModel
from viettts_tpu.ops.ar_decoder import pick_chunk

K = 8
N_TOKENS = 128


def amortized(step, *args, iters=K, trials=3):
    def chain(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s, *args)
        _ = float(s)
        return time.perf_counter() - t0

    chain(1)
    floor = min(chain(0) for _ in range(trials))
    total = min(chain(iters) for _ in range(trials))
    return max(total - floor, 0.0) / iters


def main(n_frames=1024):
    cfg = Config()
    am = AcousticModel(cfg.acoustic)
    results = {}
    for B in (1, 4, 8, 16, 32, 64):
        rng = np.random.RandomState(0)
        toks = jnp.asarray(rng.randint(0, 93, (B, N_TOKENS)), jnp.int32)
        lengths = jnp.asarray([N_TOKENS] * B, jnp.int32)
        durs = jnp.full((B, N_TOKENS), n_frames / N_TOKENS, jnp.float32)
        from viettts_tpu.types import AcousticBatch

        ab = AcousticBatch(
            toks, lengths, durs, None, None,
            jnp.zeros((B, 16, cfg.acoustic.mel_dim)),
        )
        avars = jax.jit(partial(am.init, train=False))(
            {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)},
            ab,
        )
        avars = {
            "params": avars["params"], "batch_stats": avars["batch_stats"]
        }

        def mk(use_pallas):
            @jax.jit
            def step(dep, toks, durs, lengths):
                mel = am.apply(
                    avars, toks, durs + dep * 0, n_frames, lengths,
                    method=AcousticModel.inference,
                    use_pallas=use_pallas,
                    rngs={"prenet": jax.random.PRNGKey(7)},
                )
                return mel[0, 0, 0]

            return step

        t_scan = amortized(mk(False), toks, durs, lengths)
        chunk = pick_chunk(
            B, cfg.acoustic.decoder_dim, cfg.acoustic.prenet_dim,
            cfg.acoustic.mel_dim, n_frames,
        )
        line = f"B={B:3d}: scan {t_scan*1e3:8.2f} ms"
        if chunk is not None:
            try:
                t_fused = amortized(mk(True), toks, durs, lengths)
                line += f" | fused {t_fused*1e3:8.2f} ms (chunk {chunk})"
                results[B] = (t_scan, t_fused)
            except Exception as e:  # compile failure = VMEM overflow
                line += f" | fused FAILED ({type(e).__name__})"
                results[B] = (t_scan, None)
        else:
            line += " | fused infeasible (VMEM)"
            results[B] = (t_scan, None)
        print(line, flush=True)
    wins = [b for b, (s, f) in results.items() if f is not None and f < s]
    print("fused wins at batches:", wins)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
