"""Acoustic-model training throughput on the current backend.

Runs the real jitted multi-step update (loss incl. in-graph mel extraction,
grads, clip+AdamW) on synthetic reference-shaped batches and reports
optimizer steps/sec and examples/sec.  Writes benchmarks/train_results.json.
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
    Path("benchmarks").mkdir(exist_ok=True)
    (Path("benchmarks") / "train_results.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
