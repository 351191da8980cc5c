"""Per-stage timing of the synthesis pipeline on the current backend.

Uses the amortized chained-fetch methodology (see bench.py) because the
tunneled TPU backend only synchronizes on device->host fetches.  Each stage
is compiled exactly once, with an explicit scalar ``dep`` argument that
threads a data dependency through chained iterations.
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


def amortized(step, iters=K, trials=3):
    """step(dep_scalar) -> new dep_scalar; times iters chained calls."""

    def chain(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        _ = float(s)
        return time.perf_counter() - t0

    chain(1)  # warm / compile
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

    @jax.jit
    def dur_step(dep):
        d = dm.apply(
            dvars,
            DurationBatch(toks, lengths + (dep * 0).astype(jnp.int32), None),
            train=False,
        )
        return d[0, 0]

    am = AcousticModel(cfg.acoustic)
    ab = AcousticBatch(
        toks, lengths, durations, None, None,
        jnp.zeros((batch, N_FRAMES, 80)),
    )
    avars = jax.jit(partial(am.init, train=False))(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)}, ab
    )
    avars = {"params": avars["params"], "batch_stats": avars["batch_stats"]}

    @jax.jit
    def ac_step(dep):
        mel = am.apply(
            avars, toks, durations + dep * 0, N_FRAMES, lengths,
            method=AcousticModel.inference,
            rngs={"prenet": jax.random.PRNGKey(7)},
        )
        return mel[0, 0, 0]

    gen = Generator(cfg.hifigan)
    mel0 = jnp.zeros((batch, N_FRAMES, 80))
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), mel0)

    @jax.jit
    def voc_step(dep):
        wav = gen.apply(gvars, mel0 + dep * 0)
        return wav[0, 0, 0]

    # serving path: Pallas-fused AR decode + fused-MRF vocoder
    @jax.jit
    def ac_fused_step(dep):
        mel = am.apply(
            avars, toks, durations + dep * 0, N_FRAMES, lengths,
            method=AcousticModel.inference, use_pallas=True,
            rngs={"prenet": jax.random.PRNGKey(7)},
        )
        return mel[0, 0, 0]

    from viettts_tpu.models.hifigan import generator_apply_fused

    @jax.jit
    def voc_fused_step(dep):
        wav = generator_apply_fused(cfg.hifigan, gvars["params"], mel0 + dep * 0)
        return wav[0, 0, 0]

    audio_secs = batch * N_FRAMES * cfg.dsp.hop_length / cfg.dsp.sample_rate
    samples = batch * N_FRAMES * 256

    t_dur = amortized(dur_step)
    print(f"duration fwd        : {t_dur*1e3:8.2f} ms")

    t_ac = amortized(ac_step)
    print(f"AR decode (scan)    : {t_ac*1e3:8.2f} ms  ({t_ac/N_FRAMES*1e6:.1f} us/frame)")
    t_acf = amortized(ac_fused_step)
    print(f"AR decode (fused)   : {t_acf*1e3:8.2f} ms  ({t_acf/N_FRAMES*1e6:.1f} us/frame)")

    t_voc = amortized(voc_step)
    print(f"vocoder (XLA)       : {t_voc*1e3:8.2f} ms  ({samples/t_voc/1e6:.1f} Msamples/s)")
    t_vocf = amortized(voc_fused_step)
    print(f"vocoder (fused MRF) : {t_vocf*1e3:8.2f} ms  ({samples/t_vocf/1e6:.1f} Msamples/s)")

    total = t_dur + t_ac + t_voc
    totalf = t_dur + t_acf + t_vocf
    print(f"total (XLA)         : {total*1e3:8.2f} ms  RTF {total/audio_secs:.5f}"
          f"  ({audio_secs:.1f}s audio, batch={batch})")
    print(f"total (serving path): {totalf*1e3:8.2f} ms  RTF {totalf/audio_secs:.5f}")


if __name__ == "__main__":
    import sys

    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1)
