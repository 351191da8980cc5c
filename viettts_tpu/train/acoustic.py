"""Acoustic model trainer (single code path, single chip -> pod slice).

Loss semantics match the reference (acoustic_trainer.py:30-50): log-mel
targets computed **in-graph** from silence-zeroed waveforms, go-frame
teacher forcing, seconds->frames duration conversion, combined
0.5*(MSE+MAE) over both pre- and post-postnet outputs, frame-masked by
``wav_lengths // hop``.  The data-parallel path subsumes the reference's
separate pmap trainer (acoustic_tpu_trainer.py): batch sharded over the
mesh ``data`` axis, params replicated, ``steps_per_update`` optimizer steps
fused per dispatch via lax.scan, optional exponential LR decay.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np
import optax

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.data.loader import AcousticDataset
from viettts_tpu.models import AcousticModel
from viettts_tpu.ops.mel import LogMelSpectrogram
from viettts_tpu.parallel.mesh import (
    make_mesh,
    mesh_for_batch,
    replicate,
    shard_batch,
    shard_params_fsdp,
)
from viettts_tpu.train.checkpoint import NATIVE_FORMAT, save_checkpoint
from viettts_tpu.train.common import (
    MetricAverager,
    TrainState,
    init_train_state,
    make_optimizer,
    make_update_fn,
    mixed_precision_loss,
    stack_steps,
)
from viettts_tpu.train.duration import restore_state, save_native_ckpt
from viettts_tpu.types import AcousticBatch


def prepare_batch(batch: AcousticBatch, mel_fn: LogMelSpectrogram, hop: int):
    """In-graph batch prep (reference acoustic_trainer.py:35-41): compute
    log-mels from int16 waveforms, build shifted decoder inputs, convert
    durations to frames.  Returns (model_batch, target_mels)."""
    wavs = batch.wavs.astype(jnp.float32) / (2.0**15)
    mels = mel_fn(wavs)  # [B, T, D]
    B, T, D = mels.shape
    go = jnp.zeros((B, 1, D), jnp.float32)
    inp_mels = jnp.concatenate([go, mels[:, :-1]], axis=1)
    sr = mel_fn.cfg.sample_rate
    frames = batch.durations * sr / hop
    return batch._replace(mels=inp_mels, durations=frames), mels


def make_loss_fn(model: AcousticModel, mel_fn: LogMelSpectrogram, hop: int,
                 train: bool, with_outputs: bool = False):
    def loss_fn(params, batch_stats, rng, batch: AcousticBatch):
        model_batch, mels = prepare_batch(batch, mel_fn, hop)
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = dict(
            zip(("dropout", "prenet", "zoneout"), jax.random.split(rng, 3))
        )
        if train:
            (mel1, mel2), updates = model.apply(
                variables, model_batch, train=True, rngs=rngs,
                mutable=["batch_stats"],
            )
            new_stats = updates["batch_stats"]
            extra = None
        else:
            (mel1, mel2), updates = model.apply(
                variables, model_batch, train=False, rngs=rngs,
                mutable=["intermediates"],
            )
            new_stats = batch_stats
            extra = (mel2, mels, updates["intermediates"]["attn"][0])

        sq = (jnp.square(mel1 - mels) + jnp.square(mel2 - mels)) / 2
        ab = (jnp.abs(mel1 - mels) + jnp.abs(mel2 - mels)) / 2
        per_frame = jnp.mean((sq + ab) / 2, axis=-1)  # [B, T]
        T = mels.shape[1]
        n_frames = (batch.wav_lengths // hop)[:, None]
        mask = jnp.arange(T)[None, :] < n_frames
        loss = jnp.sum(per_frame * mask) / jnp.maximum(jnp.sum(mask), 1)
        if with_outputs:
            return loss, (new_stats, extra)
        return loss, new_stats

    return loss_fn


def train(cfg: Config = Config(), save_plots: bool = True) -> TrainState:
    tcfg = cfg.train
    hop = cfg.dsp.hop_length
    mesh = mesh_for_batch(tcfg.batch_size, tcfg.num_devices)
    model = AcousticModel(cfg.acoustic)
    mel_fn = LogMelSpectrogram(cfg.dsp)

    lr = tcfg.learning_rate
    if tcfg.steps_per_update > 1:
        # reference TPU trainer uses a staircase half-life schedule
        # (acoustic_tpu_trainer.py:31)
        lr = optax.exponential_decay(lr, 50_000, 0.5, staircase=True)
    optimizer = make_optimizer(lr, tcfg.max_grad_norm, tcfg.weight_decay)

    train_ds = AcousticDataset(
        cfg.data_dir,
        cfg.data.max_phoneme_seq_len,
        cfg.data.max_wave_len,
        "train",
        cfg.data,
        cfg.dsp.sample_rate,
    )
    val_ds = AcousticDataset(
        cfg.data_dir,
        cfg.data.max_phoneme_seq_len,
        cfg.data.max_wave_len,
        "val",
        cfg.data,
        cfg.dsp.sample_rate,
    )
    train_iter = train_ds.batches(tcfg.batch_size, seed=tcfg.seed)
    val_iter = val_ds.batches(min(tcfg.batch_size, len(val_ds)), seed=0)

    rng = jax.random.PRNGKey(tcfg.seed)
    batch0 = next(train_iter)
    init_rngs = {
        "params": rng, "dropout": rng, "prenet": rng, "zoneout": rng
    }
    mb0, _ = jax.jit(partial(prepare_batch, mel_fn=mel_fn, hop=hop))(batch0)
    variables = jax.jit(partial(model.init, train=True))(init_rngs, mb0)
    state = init_train_state(
        variables["params"], variables["batch_stats"], optimizer, rng
    )

    ckpt_path = Path(cfg.ckpt_dir) / "acoustic_latest_ckpt.pickle"
    restored = restore_state(ckpt_path, optimizer, state, tcfg.checkpoint_format)
    if restored is not None:
        print(f"Resuming from {ckpt_path} at step {int(restored.step)}")
        state = restored
    if tcfg.fsdp:
        state = shard_params_fsdp(state, mesh)
    else:
        state = replicate(state, mesh)

    train_loss = make_loss_fn(model, mel_fn, hop, train=True)
    if tcfg.mixed_precision:
        train_loss = mixed_precision_loss(train_loss)
    update = make_update_fn(train_loss, optimizer)
    val_fn = jax.jit(
        partial(
            make_loss_fn(model, mel_fn, hop, train=False, with_outputs=True)
        )
    )

    train_avg = MetricAverager(1000)
    val_avg = MetricAverager(100)
    spu = tcfg.steps_per_update
    start = int(state.step)
    steps_done = 0
    t0 = time.time()
    val_snapshot = None
    from viettts_tpu.utils.profiling import trace

    step = start

    def sharded_updates():
        """One stacked batch uploaded ahead of use — host prep + the
        ~250 MB multi-step upload overlap device compute (see
        train/duration.py)."""
        from collections import deque

        queue = deque()
        while True:
            b = stack_steps([next(train_iter) for _ in range(spu)])
            queue.append(shard_batch(b, mesh, batch_axis=1))
            if len(queue) >= 2:
                yield queue.popleft()

    batch_iter = sharded_updates()
    with trace():  # device trace when VIETTTS_PROFILE_DIR is set
        # host-side step counter — see train/duration.py: a per-dispatch
        # ``int(state.step)`` sync would serialize host batching against
        # device compute
        while step < tcfg.num_training_steps:
            state, loss = update(state, next(batch_iter))
            train_avg.add(loss)
            steps_done += spu
            step = start + steps_done

            if step % tcfg.val_interval < spu:
                vb = shard_batch(next(val_iter), mesh, on_indivisible="replicate")
                vloss, (_, extra) = val_fn(
                    state.params, state.batch_stats, state.rng, vb
                )
                val_avg.add(vloss)
                val_snapshot = extra

            if step % tcfg.ckpt_interval < spu:
                dt = time.time() - t0
                sps = steps_done / max(dt, 1e-6)
                print(
                    f"step {step:>7d} | train {train_avg.mean():.4f} | "
                    f"val {val_avg.mean():.4f} | {sps:.2f} steps/s"
                )
                save_native_ckpt(ckpt_path, state, tcfg.checkpoint_format)
                if save_plots and val_snapshot is not None:
                    _save_triptych(
                        Path(cfg.ckpt_dir) / f"mel_{step:06d}.png", val_snapshot
                    )
    save_native_ckpt(ckpt_path, state, tcfg.checkpoint_format)
    return state


def _save_triptych(path: Path, snapshot) -> None:
    """Predicted mel / ground-truth mel / attention diagnostic PNG
    (reference acoustic_trainer.py:150-160)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    mel2_hat, mels, attn = snapshot
    plt.figure(figsize=(10, 10))
    plt.subplot(3, 1, 1)
    plt.imshow(np.asarray(mel2_hat[0]).T, origin="lower", aspect="auto")
    plt.subplot(3, 1, 2)
    plt.imshow(np.asarray(mels[0]).T, origin="lower", aspect="auto")
    plt.subplot(3, 1, 3)
    plt.imshow(np.asarray(attn).T, origin="lower", aspect="auto")
    plt.tight_layout()
    plt.savefig(path)
    plt.close()


def main(argv=None):
    from argparse import ArgumentParser

    from viettts_tpu.config import apply_overrides

    parser = ArgumentParser(description="Train the acoustic model")
    parser.add_argument("--data-dir", type=Path, default=None)
    parser.add_argument("--ckpt-dir", type=Path, default=None)
    parser.add_argument("--set", action="append", default=[], metavar="K=V")
    args = parser.parse_args(argv)
    cfg = apply_overrides(Config(), args.set)
    if args.data_dir:
        cfg = cfg.replace(data_dir=args.data_dir)
    if args.ckpt_dir:
        cfg = cfg.replace(ckpt_dir=args.ckpt_dir)
    Path(cfg.ckpt_dir).mkdir(parents=True, exist_ok=True)
    train(cfg)


if __name__ == "__main__":
    main()
