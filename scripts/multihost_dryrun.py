"""Multi-host dryrun worker: 2-process jax.distributed on CPU devices.

Executes the "one chip -> pod slice" claim end to end without TPU
hardware: each process brings up ``jax.distributed`` through
``viettts_tpu.parallel.mesh.initialize_distributed``, contributes 4
virtual CPU devices to an 8-device **global** mesh, runs one
data-parallel DurationModel train step on a globally-sharded batch (the
gradient all-reduce crosses the process boundary), and round-trips the
sharded state through an Orbax checkpoint (each process writes/reads its
own shards).

Run directly (two terminals or backgrounded):

    python scripts/multihost_dryrun.py --coordinator localhost:9876 \
        --num-processes 2 --process-id {0,1} --out-dir /tmp/mh

or via ``tests/test_multihost.py``, which spawns both processes.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

# Must run before any jax backend initialization: 4 virtual CPU devices
# per process, CPU platform (the axon sitecustomize would otherwise grab
# the single real TPU in both processes and deadlock on the claim).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    from argparse import ArgumentParser

    p = ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--out-dir", type=Path, required=True)
    args = p.parse_args(argv)

    from viettts_tpu.parallel.mesh import (
        batch_sharding,
        initialize_distributed,
        make_mesh,
        replicate,
    )

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 4 * args.num_processes, (n_global, n_local)

    import optax

    from viettts_tpu.config import Config, DurationModelConfig
    from viettts_tpu.models import DurationModel
    from viettts_tpu.types import DurationBatch

    cfg = Config(duration=DurationModelConfig(lstm_dim=8))
    model = DurationModel(cfg.duration)
    mesh = make_mesh(n_global)

    B, T = n_global * 2, 16
    rng = np.random.RandomState(0)
    toks_g = rng.randint(4, 20, size=(B, T)).astype(np.int32)
    lengths_g = np.full((B,), T, np.int32)
    durs_g = rng.rand(B, T).astype(np.float32)

    # init with a process-local slice (replicated params)
    variables = model.init(
        jax.random.PRNGKey(0),
        DurationBatch(jnp.asarray(toks_g[:1]), jnp.asarray(lengths_g[:1]), None),
        train=False,
    )
    params = replicate(variables, mesh)

    # globally-sharded batch: every process contributes its local rows
    def make_global(x):
        sh = batch_sharding(mesh, 0, np.ndim(x))
        local_rows = B // args.num_processes
        lo = args.process_id * local_rows
        return jax.make_array_from_process_local_data(
            sh, x[lo : lo + local_rows]
        )

    batch = DurationBatch(
        make_global(toks_g), make_global(lengths_g), make_global(durs_g)
    )

    tx = optax.adamw(1e-3)
    opt_state = jax.tree.map(
        lambda x: x, replicate(tx.init(variables["params"]), mesh)
    )

    @jax.jit
    def step(variables, opt_state, batch):
        def loss_fn(params):
            durations = model.apply(
                {**variables, "params": params}, batch, train=False
            )
            mask = jnp.arange(T)[None, :] < batch.lengths[:, None]
            return jnp.sum(jnp.abs(durations - batch.durations) * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, opt_state = tx.update(
            grads, opt_state, variables["params"]
        )
        params = optax.apply_updates(variables["params"], updates)
        return loss, {**variables, "params": params}, opt_state

    loss, variables, opt_state = step(params, opt_state, batch)
    loss = float(loss)
    assert np.isfinite(loss), loss

    # --- Orbax sharded save / restore across both processes ---
    from viettts_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    ckpt_dir = args.out_dir / "ckpt.orbax"
    payload = {"variables": variables, "loss": np.full((), loss, np.float32)}
    save_checkpoint_orbax(ckpt_dir, payload)
    restored = load_checkpoint_orbax(ckpt_dir, payload)
    for a, b in zip(
        jax.tree.leaves(variables), jax.tree.leaves(restored["variables"])
    ):
        locs = [s.data for s in a.addressable_shards]
        locs_r = [s.data for s in b.addressable_shards]
        for x, y in zip(locs, locs_r):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    out = args.out_dir / f"result_{args.process_id}.json"
    out.write_text(json.dumps({
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": n_global,
        "local_devices": n_local,
        "loss": loss,
        "ok": True,
    }))
    print(f"process {args.process_id}: ok loss={loss:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
