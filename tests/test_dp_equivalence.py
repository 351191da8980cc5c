"""Data-parallel / FSDP numerical equivalence.

The correctness contract of the distributed layout (reference
equivalent: the ``lax.pmean`` gradient sync in
acoustic_tpu_trainer.py:42-53), checked three ways against a 1-device
run on the same host batches:

* gradients agree to reassociation noise (<1e-6) — a wrong or missing
  all-reduce shows up here directly;
* K optimizer steps under SGD+global-norm-clip reach the same
  parameters (<1e-6) — the clip's global-norm psum is also exercised;
* K steps under the production AdamW chain reach the same loss
  trajectory.  (AdamW *parameters* are deliberately not compared
  element-wise: on near-zero-gradient elements Adam's first-step update
  is ±lr regardless of gradient magnitude, so ~1e-8 reduction-order
  noise legitimately flips single elements by 2*lr.  The matching loss
  trajectory is the meaningful statement.)

Also covers the shard_batch divisibility contract: a batch axis not
divisible by the mesh raises instead of silently replicating (an
invisible num_devices-x throughput loss).
"""

from functools import partial

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from viettts_tpu.config import AcousticModelConfig, Config, DspConfig
from viettts_tpu.models import AcousticModel
from viettts_tpu.ops.mel import LogMelSpectrogram
from viettts_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_params_fsdp,
)
from viettts_tpu.train.acoustic import make_loss_fn, prepare_batch
from viettts_tpu.train.common import (
    init_train_state,
    make_optimizer,
    make_update_fn,
    stack_steps,
)
from viettts_tpu.types import AcousticBatch

B, T_TOKENS, S, SR = 8, 8, 4096, 16000
STEPS_PER_UPDATE, NUM_UPDATES = 2, 2


def _make_batch(seed: int) -> AcousticBatch:
    rng = np.random.RandomState(seed)
    return AcousticBatch(
        phonemes=np.asarray(rng.randint(0, 93, (B, T_TOKENS)), np.int32),
        lengths=np.asarray([T_TOKENS] * B, np.int32),
        durations=np.full((B, T_TOKENS), S / SR / T_TOKENS, np.float32),
        wavs=(rng.randn(B, S) * 2000).astype(np.int16),
        wav_lengths=np.asarray([S] * B, np.int32),
        mels=None,
    )


@pytest.fixture(scope="module")
def harness():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = Config(
        acoustic=AcousticModelConfig(
            encoder_dim=16, decoder_dim=16, prenet_dim=8, postnet_dim=8
        ),
        dsp=DspConfig(),
    )
    model = AcousticModel(cfg.acoustic)
    mel_fn = LogMelSpectrogram(cfg.dsp)
    hop = cfg.dsp.hop_length

    key = jax.random.PRNGKey(0)
    batch0 = jax.tree.map(jnp.asarray, _make_batch(0))
    mb0, _ = jax.jit(partial(prepare_batch, mel_fn=mel_fn, hop=hop))(batch0)
    variables = jax.jit(partial(model.init, train=True))(
        {"params": key, "dropout": key, "prenet": key, "zoneout": key}, mb0
    )
    host_vars = jax.tree.map(np.asarray, dict(variables))

    loss_fn = make_loss_fn(model, mel_fn, hop, train=True)
    update_batches = [
        stack_steps([_make_batch(10 * u + s) for s in range(STEPS_PER_UPDATE)])
        for u in range(NUM_UPDATES)
    ]
    return {
        "host_vars": host_vars,
        "loss_fn": loss_fn,
        "batches": update_batches,
    }


def _run(harness, optimizer, n_devices: int, fsdp: bool = False):
    mesh = make_mesh(n_devices)
    state = init_train_state(
        harness["host_vars"]["params"],
        harness["host_vars"]["batch_stats"],
        optimizer,
        jax.random.PRNGKey(42),
    )
    if fsdp:
        state = shard_params_fsdp(state, mesh, min_size=256)
    else:
        state = replicate(state, mesh)
    update = make_update_fn(harness["loss_fn"], optimizer)
    losses = []
    for batches in harness["batches"]:
        sharded = shard_batch(batches, mesh, batch_axis=1)
        state, loss = update(state, sharded)
        losses.append(float(loss))
    params = jax.tree.map(np.asarray, state.params)
    return params, losses


def _grads(harness, n_devices: int):
    mesh = make_mesh(n_devices)
    params = replicate(harness["host_vars"]["params"], mesh)
    stats = replicate(harness["host_vars"]["batch_stats"], mesh)
    batch = shard_batch(
        jax.tree.map(lambda x: x[0], harness["batches"][0]), mesh
    )
    grad_fn = jax.jit(jax.grad(harness["loss_fn"], has_aux=True))
    grads, _ = grad_fn(params, stats, jax.random.PRNGKey(7), batch)
    return jax.tree.map(np.asarray, grads)


def _max_delta(a, b) -> float:
    deltas = jax.tree.map(lambda x, y: float(np.max(np.abs(x - y))), a, b)
    return max(jax.tree.leaves(deltas))


def _sgd_chain():
    return optax.chain(
        optax.clip_by_global_norm(1.0), optax.sgd(learning_rate=0.05)
    )


def test_dp_gradients_match_single_device(harness):
    g1 = _grads(harness, 1)
    g8 = _grads(harness, 8)
    assert _max_delta(g8, g1) < 1e-6


def test_dp_sgd_params_match_single_device(harness):
    params1, losses1 = _run(harness, _sgd_chain(), 1)
    params8, losses8 = _run(harness, _sgd_chain(), 8)
    np.testing.assert_allclose(losses8, losses1, rtol=1e-5, atol=1e-6)
    assert _max_delta(params8, params1) < 1e-6


def test_dp_adamw_loss_trajectory_matches(harness):
    opt = make_optimizer(1e-3)
    _, losses1 = _run(harness, opt, 1)
    _, losses8 = _run(harness, opt, 8)
    np.testing.assert_allclose(losses8, losses1, rtol=1e-5, atol=1e-6)


def test_fsdp_matches_single_device(harness):
    """FSDP-sharded params/optimizer state reach the same result as the
    replicated 1-device run (XLA's all-gather/reduce-scatter insertion is
    semantics-preserving)."""
    params1, losses1 = _run(harness, _sgd_chain(), 1)
    params_fsdp, losses_fsdp = _run(harness, _sgd_chain(), 8, fsdp=True)
    np.testing.assert_allclose(losses_fsdp, losses1, rtol=1e-5, atol=1e-6)
    assert _max_delta(params_fsdp, params1) < 1e-6


def test_shard_batch_rejects_indivisible_batch():
    mesh = make_mesh(8)
    bad = {"x": np.zeros((12, 4), np.float32)}  # 12 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(bad, mesh)
    # scalars / batchless leaves still replicate fine
    out = shard_batch({"x": np.zeros((16, 4)), "s": np.float32(3.0)}, mesh)
    assert out["s"].shape == ()
    # explicit opt-in replication for eval batches
    rep = shard_batch(bad, mesh, on_indivisible="replicate")
    assert rep["x"].shape == (12, 4)
    assert rep["x"].sharding.is_fully_replicated
