"""Shared trainer machinery: train state, optimizer, sharded update step.

One code path subsumes the reference's separate single-device and pmap
trainers (acoustic_trainer.py vs acoustic_tpu_trainer.py): the update is a
``jax.jit`` over a device mesh with the batch sharded on the ``data`` axis
and parameters replicated; XLA inserts the gradient all-reduce.  Multiple
optimizer steps are fused per dispatch with ``lax.scan`` (the reference's
``steps_per_update`` trick, acoustic_tpu_trainer.py:48-53) to amortize
host->device latency.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import numpy as np
import optax

import jax
import jax.numpy as jnp

from viettts_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)


class TrainState(NamedTuple):
    step: jax.Array  # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def make_optimizer(
    learning_rate, max_grad_norm: float = 1.0, weight_decay: float = 1e-4
) -> optax.GradientTransformation:
    """The reference's optimizer chain: global-norm clip + AdamW
    (duration_trainer.py:55-58)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )


LossFn = Callable[..., Tuple[jax.Array, Any]]
# loss_fn(params, batch_stats, rng, batch) -> (loss, new_batch_stats)


def mixed_precision_loss(loss_fn: LossFn) -> LossFn:
    """bf16 mixed precision via param casting at the loss boundary:
    master params stay f32 (the optimizer sees f32 grads — the cast is
    differentiable and accumulates in f32); the forward/backward compute
    runs in bfloat16.  Updated batch stats are cast back to f32."""

    def wrapped(params, batch_stats, rng, batch):
        params_c = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            params,
        )
        stats_c = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            batch_stats,
        )
        loss, new_stats = loss_fn(params_c, stats_c, rng, batch)
        new_stats = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
            else x,
            new_stats,
        )
        return loss.astype(jnp.float32), new_stats

    return wrapped


def make_update_fn(
    loss_fn: LossFn, optimizer: optax.GradientTransformation
) -> Callable[[TrainState, Any], Tuple[TrainState, jax.Array]]:
    """Build the jitted multi-step update.

    ``batches`` must be stacked along a leading scan axis:
    [steps_per_update, batch, ...].  Returns (new_state, mean loss).
    """

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        (loss, new_stats), grads = grad_fn(
            state.params, state.batch_stats, step_rng, batch
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, params, new_stats, opt_state, rng),
            loss,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def update(state: TrainState, batches):
        state, losses = jax.lax.scan(one_step, state, batches)
        return state, jnp.mean(losses)

    return update


def stack_steps(batches: list) -> Any:
    """Stack ``steps_per_update`` host batches along a new leading axis."""
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def init_train_state(
    params: Any,
    batch_stats: Any,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    step: int = 0,
) -> TrainState:
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        rng=rng,
    )


class MetricAverager:
    """Rolling mean of the last N scalar losses (reference keeps Deques of
    1000 train / 100 val losses, duration_trainer.py:99-100)."""

    def __init__(self, maxlen: int):
        from collections import deque

        self._dq = deque(maxlen=maxlen)

    def add(self, value):
        self._dq.append(value)

    def mean(self) -> float:
        if not self._dq:
            return float("nan")
        vals = [float(np.asarray(v)) for v in self._dq]
        return sum(vals) / len(vals)
