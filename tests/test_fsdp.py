"""FSDP-style parameter sharding: leaves actually split across the mesh
and the trainers run under it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viettts_tpu.parallel.mesh import (
    fsdp_sharding_for,
    make_mesh,
    shard_params_fsdp,
)

from tests.test_trainers import _tiny_config, corpus  # noqa: F401


def test_fsdp_sharding_rules():
    mesh = make_mesh()
    big = jnp.zeros((512, 1024))
    small = jnp.zeros((17,))
    odd = jnp.zeros((257, 33 * 9))  # both axes indivisible by 8

    s_big = fsdp_sharding_for(big, mesh)
    assert s_big.spec != jax.sharding.PartitionSpec()
    placed = jax.device_put(big, s_big)
    assert len(placed.sharding.device_set) == 8
    # the largest axis is the sharded one
    assert placed.addressable_shards[0].data.shape in ((512, 128), (64, 1024))

    assert fsdp_sharding_for(small, mesh).spec == jax.sharding.PartitionSpec()
    assert fsdp_sharding_for(odd, mesh).spec == jax.sharding.PartitionSpec()


def test_duration_trainer_with_fsdp(corpus, tmp_path):  # noqa: F811
    import dataclasses

    from viettts_tpu.train import duration as dtrain

    cfg = _tiny_config(corpus, tmp_path, steps=2)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, fsdp=True))
    state = dtrain.train(cfg)
    assert int(state.step) == 2
    # training under fsdp keeps large params sharded
    leaves = jax.tree.leaves(state.params)
    big = max(leaves, key=lambda x: x.size)
    assert len(big.sharding.device_set) == 8
