"""End-to-end smoke test of the library surface on whatever backend jax
selects (real TPU under axon): text -> tokens -> duration model -> acoustic
AR decode -> HiFi-GAN vocoder -> waveform, everything jitted.

Uses randomly initialized weights (no trained checkpoints needed); checks
shapes, finiteness and steady-state dispatch.
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models import AcousticModel, DurationModel, Generator
from viettts_tpu.ops import LogMelSpectrogram
from viettts_tpu.text import normalize_text, text_to_tokens
from viettts_tpu.types import AcousticBatch, DurationBatch


def main():
    print("platform:", jax.devices())
    cfg = Config()
    text = normalize_text("Hôm qua em tới trường, mẹ dắt tay từng bước.")
    tokens = text_to_tokens(text)
    toks = jnp.asarray(np.array(tokens, np.int32)[None])
    lengths = jnp.asarray([len(tokens)], jnp.int32)

    dm = DurationModel(cfg.duration)
    dvars = jax.jit(partial(dm.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, DurationBatch(toks, lengths, None)
    )
    dapply = jax.jit(partial(dm.apply, train=False))
    dvars_ro = {"params": dvars["params"], "batch_stats": dvars["batch_stats"]}
    durs = dapply(dvars_ro, DurationBatch(toks, lengths, None))
    assert durs.shape == (1, len(tokens))
    print("duration ok", durs.shape)

    frames = durs * cfg.dsp.sample_rate / cfg.dsp.hop_length
    n_frames = 128
    am = AcousticModel(cfg.acoustic)
    ab = AcousticBatch(
        toks, lengths, frames, None, None, jnp.zeros((1, n_frames, 80))
    )
    avars = jax.jit(partial(am.init, train=False))(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(2)}, ab
    )
    ainfer = jax.jit(
        partial(am.apply, method=AcousticModel.inference), static_argnums=(3,)
    )
    avars_ro = {"params": avars["params"], "batch_stats": avars["batch_stats"]}
    mel = ainfer(
        avars_ro, toks, frames, n_frames, lengths,
        rngs={"prenet": jax.random.PRNGKey(7)},
    )
    assert mel.shape == (1, n_frames, 80)
    print("acoustic AR decode ok", mel.shape)

    gen = Generator(cfg.hifigan)
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    gapply = jax.jit(gen.apply)
    wav = gapply(gvars, mel)
    assert wav.shape == (1, n_frames * 256, 1)
    print("vocoder ok", wav.shape)

    melfn = LogMelSpectrogram(cfg.dsp)
    m2 = jax.jit(melfn.__call__)(wav[..., 0])
    assert bool(jnp.isfinite(m2).all())

    t0 = time.time()
    wav = gapply(gvars, mel)
    wav.block_until_ready()
    print("vocoder steady dispatch %.4fs" % (time.time() - t0))
    print("END2END OK")


if __name__ == "__main__":
    main()
