"""Duration model trainer.

Loss and training semantics match the reference
(/root/reference/vietTTS/nat/duration_trainer.py:19-67): 10% random
token->word-end masking augmentation, masked L1 over real non-word-end
tokens, clip+AdamW, resumable checkpoints every 1000 steps with val loss
every 10.  Runs data-parallel over a ``Mesh`` via plain jit sharding.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config, WORD_END_INDEX
from viettts_tpu.data.loader import DurationDataset
from viettts_tpu.models import DurationModel
from viettts_tpu.parallel.mesh import (
    make_mesh,
    mesh_for_batch,
    replicate,
    shard_batch,
    shard_params_fsdp,
)
from viettts_tpu.train.checkpoint import (
    NATIVE_FORMAT,
    load_checkpoint,
    save_checkpoint,
)
from viettts_tpu.train.common import (
    MetricAverager,
    TrainState,
    init_train_state,
    make_optimizer,
    make_update_fn,
    mixed_precision_loss,
    stack_steps,
)
from viettts_tpu.types import DurationBatch


def make_loss_fn(model: DurationModel, token_mask_prob: float, train: bool):
    """loss(params, batch_stats, rng, batch) -> (loss, new_batch_stats)."""

    def loss_fn(params, batch_stats, rng, batch: DurationBatch):
        mask_rng, dropout_rng = jax.random.split(rng)
        phonemes = batch.phonemes
        if train and token_mask_prob > 0:
            m = jax.random.bernoulli(
                mask_rng, token_mask_prob, phonemes.shape
            )
            phonemes = jnp.where(m, WORD_END_INDEX, phonemes)
            batch = batch._replace(phonemes=phonemes)

        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            durations, updates = model.apply(
                variables,
                batch,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            new_stats = updates["batch_stats"]
        else:
            durations = model.apply(variables, batch, train=False)
            new_stats = batch_stats

        L = phonemes.shape[1]
        mask = jnp.arange(L)[None, :] < batch.lengths[:, None]
        mask = jnp.where(phonemes == WORD_END_INDEX, False, mask)
        masked_l1 = jnp.abs(durations - batch.durations) * mask
        loss = jnp.sum(masked_l1) / jnp.maximum(jnp.sum(mask), 1)
        return loss, new_stats

    return loss_fn


def _orbax_dir(path: Path) -> Path:
    return Path(path).with_suffix(".orbax")


def save_native_ckpt(
    path: Path, state: TrainState, fmt: str = "pickle"
) -> None:
    """Write a resumable training checkpoint: ``fmt="pickle"`` is one
    atomic file (the reference's contract); ``fmt="orbax"`` writes a
    sharded tensorstore directory next to it (multi-host runs)."""
    if fmt == "orbax":
        from viettts_tpu.train.checkpoint import save_checkpoint_orbax

        save_checkpoint_orbax(
            _orbax_dir(path),
            {
                "step": np.asarray(int(state.step), np.int32),
                "variables": {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                },
                "opt_state": state.opt_state,
                "rng": state.rng,
            },
        )
        return
    if fmt != "pickle":
        raise ValueError(f"unknown checkpoint_format {fmt!r}")
    save_checkpoint(
        path,
        {
            "format": NATIVE_FORMAT,
            "step": int(state.step),
            "variables": {
                "params": state.params,
                "batch_stats": state.batch_stats,
            },
            "opt_state": state.opt_state,
            "rng": state.rng,
        },
    )


def restore_state(
    path: Path, optimizer, template: TrainState, fmt: str = "pickle"
) -> Optional[TrainState]:
    if fmt == "orbax":
        from viettts_tpu.train.checkpoint import load_checkpoint_orbax

        tpl = {
            "step": np.asarray(0, np.int32),
            "variables": {
                "params": template.params,
                "batch_stats": template.batch_stats,
            },
            "opt_state": template.opt_state,
            "rng": template.rng,
        }
        dic = load_checkpoint_orbax(_orbax_dir(path), tpl)
        if dic is None:
            return None
        return TrainState(
            step=jnp.asarray(dic["step"], jnp.int32),
            params=dic["variables"]["params"],
            batch_stats=dic["variables"]["batch_stats"],
            opt_state=dic["opt_state"],
            rng=jnp.asarray(dic["rng"]),
        )
    dic = load_checkpoint(path)
    if dic is None or dic.get("format") != NATIVE_FORMAT:
        return None
    return TrainState(
        step=jnp.asarray(dic["step"], jnp.int32),
        params=jax.tree.map(jnp.asarray, dic["variables"]["params"]),
        batch_stats=jax.tree.map(jnp.asarray, dic["variables"]["batch_stats"]),
        opt_state=jax.tree.map(jnp.asarray, dic["opt_state"]),
        rng=jnp.asarray(dic["rng"]),
    )


def _save_duration_plot(path: Path, predicted, target, length: int) -> None:
    """Predicted-vs-ground-truth duration curves PNG (reference
    duration_trainer.py:79-89)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    plt.figure()
    plt.plot(np.asarray(predicted)[:length])
    plt.plot(np.asarray(target)[:length])
    plt.legend(["predicted", "gt"])
    plt.title("Phoneme durations")
    plt.savefig(path)
    plt.close()


def train(
    cfg: Config = Config(), save_plots: bool = False
) -> TrainState:
    tcfg = cfg.train
    mesh = mesh_for_batch(tcfg.batch_size, tcfg.num_devices)
    model = DurationModel(cfg.duration)
    optimizer = make_optimizer(
        tcfg.duration_learning_rate, tcfg.max_grad_norm, tcfg.weight_decay
    )

    train_ds = DurationDataset(
        cfg.data_dir, cfg.data.max_phoneme_seq_len, "train", cfg.data
    )
    val_ds = DurationDataset(
        cfg.data_dir, cfg.data.max_phoneme_seq_len, "val", cfg.data
    )
    train_iter = train_ds.batches(tcfg.batch_size, seed=tcfg.seed)
    val_iter = val_ds.batches(min(tcfg.batch_size, len(val_ds)), seed=0)

    rng = jax.random.PRNGKey(tcfg.seed)
    batch0 = next(train_iter)
    variables = jax.jit(partial(model.init, train=True))(
        {"params": rng, "dropout": rng}, batch0
    )
    state = init_train_state(
        variables["params"], variables["batch_stats"], optimizer, rng
    )

    ckpt_path = Path(cfg.ckpt_dir) / "duration_latest_ckpt.pickle"
    restored = restore_state(ckpt_path, optimizer, state, tcfg.checkpoint_format)
    if restored is not None:
        print(f"Resuming from {ckpt_path} at step {int(restored.step)}")
        state = restored
    if tcfg.fsdp:
        state = shard_params_fsdp(state, mesh)
    else:
        state = replicate(state, mesh)

    train_loss = make_loss_fn(model, tcfg.token_mask_prob, train=True)
    if tcfg.mixed_precision:
        train_loss = mixed_precision_loss(train_loss)
    update = make_update_fn(train_loss, optimizer)
    val_loss_fn = jax.jit(
        lambda p, s, r, b: make_loss_fn(model, 0.0, train=False)(p, s, r, b)[0]
    )
    predict_fn = jax.jit(partial(model.apply, train=False))

    train_avg = MetricAverager(1000)
    val_avg = MetricAverager(100)
    spu = tcfg.steps_per_update
    start = int(state.step)
    t0 = time.time()
    steps_done = 0
    from viettts_tpu.utils.profiling import trace

    step = start

    def sharded_updates():
        """Stacked multi-step batches placed on the mesh one dispatch
        ahead, so host batch prep + upload overlap device compute (same
        pattern as the GAN loop, train/hifigan.py)."""
        from collections import deque

        queue = deque()
        while True:
            b = stack_steps([next(train_iter) for _ in range(spu)])
            queue.append(shard_batch(b, mesh, batch_axis=1))
            if len(queue) >= 2:
                yield queue.popleft()

    batch_iter = sharded_updates()
    with trace():  # device trace when VIETTTS_PROFILE_DIR is set
        # host-side step counter: fetching ``int(state.step)`` every
        # dispatch is a blocking device sync that stops the next host
        # batch from overlapping device compute (same stall measured 16x
        # in the GAN loop, train/hifigan.py)
        while step < tcfg.num_training_steps:
            state, loss = update(state, next(batch_iter))
            train_avg.add(loss)
            steps_done += spu
            step = start + steps_done

            if step % tcfg.val_interval < spu:
                vb = shard_batch(next(val_iter), mesh, on_indivisible="replicate")
                val_avg.add(val_loss_fn(state.params, state.batch_stats, state.rng, vb))

            if step % tcfg.ckpt_interval < spu:
                dt = time.time() - t0
                sps = steps_done / max(dt, 1e-6)
                print(
                    f"step {step:>7d} | train {train_avg.mean():.5f} | "
                    f"val {val_avg.mean():.5f} | {sps:.1f} steps/s"
                )
                save_native_ckpt(ckpt_path, state, tcfg.checkpoint_format)
                if save_plots:
                    vb = next(val_iter)
                    pred = predict_fn(
                        {
                            "params": state.params,
                            "batch_stats": state.batch_stats,
                        },
                        vb,
                    )
                    _save_duration_plot(
                        Path(cfg.ckpt_dir) / f"duration_{step:06d}.png",
                        pred[0],
                        vb.durations[0],
                        int(vb.lengths[0]),
                    )
    save_native_ckpt(ckpt_path, state, tcfg.checkpoint_format)
    return state


def main(argv=None):
    from argparse import ArgumentParser

    from viettts_tpu.config import apply_overrides

    parser = ArgumentParser(description="Train the duration model")
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
