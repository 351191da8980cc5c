"""Per-stage timing of the synthesis pipeline on the current backend.

Uses the amortized chained-fetch methodology (see bench.py) because the
tunneled TPU backend only synchronizes on device->host fetches.
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models import AcousticModel, DurationModel, Generator
from viettts_tpu.types import AcousticBatch, DurationBatch

N_TOKENS = 256
N_FRAMES = 1024
K = 8


def amortized(fn, init, iters=K, trials=3):
    """Time iters chained applications of fn, subtracting the fetch floor."""

    def chain(n):
        s = init
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s)
        jax.tree.leaves(s)[0].block_until_ready()
        _ = np.asarray(jax.tree.leaves(s)[0]).ravel()[0]
        return time.perf_counter() - t0

    chain(1)  # warm
    floor = min(chain(0) for _ in range(trials))
    total = min(chain(iters) for _ in range(trials))
    return max(total - floor, 0.0) / iters


def main(batch=1):
    cfg = Config()
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 93, (batch, N_TOKENS)), jnp.int32)
    lengths = jnp.asarray([N_TOKENS] * batch, jnp.int32)
    durations = jnp.full((batch, N_TOKENS), N_FRAMES / N_TOKENS, jnp.float32)

    dm = DurationModel(cfg.duration)
    dvars = jax.jit(partial(dm.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, DurationBatch(toks, lengths, None)
    )
    dvars = {"params": dvars["params"], "batch_stats": dvars["batch_stats"]}
    dapply = jax.jit(partial(dm.apply, train=False))

    am = AcousticModel(cfg.acoustic)
    ab = AcousticBatch(
        toks, lengths, durations, None, None,
        jnp.zeros((batch, N_FRAMES, 80)),
    )
    avars = jax.jit(partial(am.init, train=False))(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)}, ab
    )
    avars = {"params": avars["params"], "batch_stats": avars["batch_stats"]}
    ainfer = jax.jit(
        partial(am.apply, method=AcousticModel.inference), static_argnums=(3,)
    )

    gen = Generator(cfg.hifigan)
    mel0 = jnp.zeros((batch, N_FRAMES, 80))
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), mel0)
    vocode = jax.jit(gen.apply)

    audio_secs = batch * N_FRAMES * cfg.dsp.hop_length / cfg.dsp.sample_rate

    t_dur = amortized(
        lambda d: dapply(
            dvars,
            DurationBatch(toks, lengths, None)._replace(
                phonemes=toks + (d[0, 0] * 0).astype(jnp.int32)
            ),
        ),
        dapply(dvars, DurationBatch(toks, lengths, None)),
    )
    print(f"duration fwd      : {t_dur*1e3:8.2f} ms")

    t_ac = amortized(
        lambda m: ainfer(
            avars, toks, durations + m[0, 0, 0] * 0, N_FRAMES, lengths,
            rngs={"prenet": jax.random.PRNGKey(7)},
        ),
        ainfer(avars, toks, durations, N_FRAMES, lengths,
               rngs={"prenet": jax.random.PRNGKey(7)}),
    )
    print(f"acoustic AR decode: {t_ac*1e3:8.2f} ms  ({t_ac/N_FRAMES*1e6:.1f} us/frame)")

    t_voc = amortized(
        lambda w: vocode(gvars, mel0 + w[0, 0, 0] * 0),
        vocode(gvars, mel0),
    )
    samples = batch * N_FRAMES * 256
    print(f"vocoder           : {t_voc*1e3:8.2f} ms  ({samples/t_voc/1e6:.1f} Msamples/s)")

    total = t_dur + t_ac + t_voc
    print(f"total             : {total*1e3:8.2f} ms  RTF {total/audio_secs:.5f}"
          f"  ({audio_secs:.1f}s audio, batch={batch})")


if __name__ == "__main__":
    import sys

    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1)
