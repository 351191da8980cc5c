"""Training throughput on the current backend.

Acoustic: the real jitted multi-step update (loss incl. in-graph mel
extraction, grads, clip+AdamW) on synthetic reference-shaped batches.
Vocoder: the full HiFi-GAN GAN step (generator + MPD + MSD fwd/bwd, both
optimizers) at production size, f32 and bf16 mixed precision.
Writes benchmarks/train_results.json.
"""

import json
import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 32
SEQ_LEN = 256
WAVE_LEN = 1024 * 64 * 3  # 196608 samples, the corpus cap
STEPS_PER_UPDATE = 4
UPDATES = 4


def main():
    from viettts_tpu.config import Config
    from viettts_tpu.models import AcousticModel
    from viettts_tpu.ops.mel import LogMelSpectrogram
    from viettts_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from viettts_tpu.train.acoustic import make_loss_fn, prepare_batch
    from viettts_tpu.train.common import (
        init_train_state,
        make_optimizer,
        make_update_fn,
        stack_steps,
    )
    from viettts_tpu.types import AcousticBatch

    cfg = Config()
    hop = cfg.dsp.hop_length
    mesh = make_mesh()
    model = AcousticModel(cfg.acoustic)
    mel_fn = LogMelSpectrogram(cfg.dsp)

    rng = np.random.RandomState(0)
    durations = np.full(
        (BATCH, SEQ_LEN), WAVE_LEN / cfg.dsp.sample_rate / SEQ_LEN, np.float32
    )
    batch = AcousticBatch(
        phonemes=rng.randint(0, 93, (BATCH, SEQ_LEN)).astype(np.int32),
        lengths=np.full((BATCH,), SEQ_LEN, np.int32),
        durations=durations,
        wavs=(rng.randn(BATCH, WAVE_LEN) * 2000).astype(np.int16),
        wav_lengths=np.full((BATCH,), WAVE_LEN, np.int32),
        mels=None,
    )

    key = jax.random.PRNGKey(0)
    mb0, _ = jax.jit(partial(prepare_batch, mel_fn=mel_fn, hop=hop))(
        jax.tree.map(jnp.asarray, batch)
    )
    variables = jax.jit(partial(model.init, train=True))(
        {"params": key, "dropout": key, "prenet": key, "zoneout": key}, mb0
    )
    optimizer = make_optimizer(1e-4)
    state = init_train_state(
        variables["params"], variables["batch_stats"], optimizer, key
    )
    state = replicate(state, mesh)
    update = make_update_fn(
        make_loss_fn(model, mel_fn, hop, train=True), optimizer
    )

    batches = stack_steps([batch] * STEPS_PER_UPDATE)
    batches = shard_batch(batches, mesh, batch_axis=1)

    # warm / compile
    state, loss = update(state, batches)
    _ = float(loss)

    t0 = time.perf_counter()
    for _ in range(UPDATES):
        state, loss = update(state, batches)
    _ = float(loss)
    dt = time.perf_counter() - t0

    steps = UPDATES * STEPS_PER_UPDATE
    results = {
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "batch_size": BATCH,
        "steps_per_update": STEPS_PER_UPDATE,
        "optimizer_steps_per_sec": steps / dt,
        "examples_per_sec": steps * BATCH / dt,
        "audio_seconds_trained_per_sec": steps
        * BATCH
        * WAVE_LEN
        / cfg.dsp.sample_rate
        / dt,
        "final_loss": float(loss),
    }
    results["vocoder_gan"] = bench_gan()

    Path("benchmarks").mkdir(exist_ok=True)
    (Path("benchmarks") / "train_results.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps(results, indent=2))


def bench_gan(batch=16, steps=6):
    """Full-size HiFi-GAN GAN-step throughput, f32 vs bf16."""
    import dataclasses

    from viettts_tpu.config import Config, TrainConfig
    from viettts_tpu.models.hifigan import (
        Generator,
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )
    from viettts_tpu.ops.mel import LogMelSpectrogram
    from viettts_tpu.train.hifigan import GanState, make_gan_step

    import optax

    out = {"batch_size": batch}
    for mixed in (False, True):
        cfg = Config(train=TrainConfig(mixed_precision=mixed))
        hcfg = cfg.hifigan
        mel_fn = LogMelSpectrogram(cfg.dsp)
        gen_dtype = jnp.bfloat16 if mixed else jnp.float32
        generator = Generator(hcfg, use_wn=True, dtype=gen_dtype)
        mpd = MultiPeriodDiscriminator(
            periods=hcfg.mpd_periods, base_channels=hcfg.mpd_base_channels
        )
        msd = MultiScaleDiscriminator(
            num_scales=hcfg.msd_scales, base_channels=hcfg.msd_base_channels
        )
        tx = optax.adamw(hcfg.learning_rate, b1=hcfg.adam_b1, b2=hcfg.adam_b2)

        rng = np.random.RandomState(0)
        audio = jnp.asarray(
            rng.randn(batch, hcfg.segment_size).astype(np.float32) * 0.1
        )
        mel = jax.jit(mel_fn)(audio)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        gen_params = jax.jit(generator.init)(k1, mel)["params"]
        y0 = audio[..., None]
        msd_vars = jax.jit(partial(msd.init))(k3, y0, y0)
        disc_params = {
            "mpd": jax.jit(mpd.init)(k2, y0, y0)["params"],
            "msd": msd_vars["params"],
        }
        state = GanState(
            step=jnp.asarray(0, jnp.int32),
            gen_params=gen_params,
            disc_params=disc_params,
            spectral=msd_vars.get("spectral", {}),
            gen_opt=tx.init(gen_params),
            disc_opt=tx.init(disc_params),
            rng=jax.random.PRNGKey(0),
        )
        step_fn = make_gan_step(cfg, generator, mpd, msd, tx, tx, mel_fn)
        state, metrics = step_fn(state, None, audio)  # compile
        _ = float(metrics["mel_l1"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, None, audio)
        _ = float(metrics["mel_l1"])
        dt = time.perf_counter() - t0
        key = "bf16" if mixed else "f32"
        out[f"steps_per_sec_{key}"] = steps / dt
        out[f"mel_l1_{key}"] = float(metrics["mel_l1"])
    return out


if __name__ == "__main__":
    main()
