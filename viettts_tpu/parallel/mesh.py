"""Device mesh and sharding utilities.

The reference's entire distributed layer is ``jax.pmap`` +
``lax.pmean(axis_name="i")`` with manually replicated params
(/root/reference/vietTTS/nat/acoustic_tpu_trainer.py:42-53,110-118).  Here
the equivalent is the modern JAX SPMD stack: one ``jax.sharding.Mesh``, a
``NamedSharding`` per argument, and a single ``jax.jit`` whose gradient
all-reduce is inserted by XLA over ICI.  The same code path scales from one
chip to a pod slice; ``jax.distributed.initialize`` extends it across hosts.

Mesh axes:
  * ``data``  — batch sharding (data parallel).
  * ``model`` — reserved for tensor-parallel layouts of large configs
    (unused by the default single-axis trainers).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: call once per host before building a mesh.

    Thin wrapper over ``jax.distributed.initialize`` (auto-detects on Cloud
    TPU pods when called with no arguments).  After this,
    ``jax.devices()`` spans the whole slice and ``make_mesh`` builds a
    global mesh whose collectives ride ICI within a slice and DCN across
    slices.  The reference has no multi-host story at all
    (acoustic_tpu_trainer.py is single-process pmap).
    """
    import jax.distributed

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(
    num_devices: int = -1, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """Build a 1-D (or reshaped N-D) mesh over the first ``num_devices``
    devices.  ``-1`` uses every local device."""
    devices = jax.devices()
    if num_devices == -1:
        num_devices = len(devices)
    devices = devices[:num_devices]
    if len(axis_names) == 1:
        shape: tuple = (num_devices,)
    else:
        # put everything on the leading axis by default
        shape = (num_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def mesh_for_batch(batch_size: int, num_devices: int = -1) -> Mesh:
    """Data-parallel mesh whose size divides ``batch_size`` — the largest
    such device count.  Trainers use this so a small debug batch on a big
    mesh shrinks the mesh (loudly) instead of silently replicating work."""
    devices = jax.devices()
    n = len(devices) if num_devices == -1 else num_devices
    full = n
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n != full:
        print(
            f"mesh_for_batch: batch {batch_size} not divisible by "
            f"{full} devices; using a {n}-device mesh"
        )
    return make_mesh(n)


def batch_sharding(
    mesh: Mesh, batch_axis: int = 0, ndim: Optional[int] = None
) -> NamedSharding:
    """Sharding that splits the batch axis across the ``data`` mesh axis."""
    if ndim is None:
        spec = [None] * (batch_axis + 1)
    else:
        spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(
    batch: Any,
    mesh: Mesh,
    batch_axis: int = 0,
    on_indivisible: str = "error",
) -> Any:
    """Place a host batch on the mesh, batch axis split across ``data``.

    Scalars / arrays without the batch axis are replicated.  An array that
    *has* the batch axis but whose size is not divisible by the mesh raises
    by default — silently replicating it would be an invisible
    ``num_devices``-times throughput loss (and would train on each example
    ``num_devices`` times per step).  Pad the batch (or drop the remainder)
    at the data-loader level instead; or pass
    ``on_indivisible="replicate"`` where replication is the intended
    semantics (small validation batches evaluated identically everywhere).
    """
    if on_indivisible not in ("error", "replicate"):
        raise ValueError(f"on_indivisible={on_indivisible!r}")
    n = mesh.shape["data"]

    def put(x):
        x = np.asarray(x)
        if x.ndim > batch_axis:
            if x.shape[batch_axis] % n != 0:
                if on_indivisible == "error":
                    raise ValueError(
                        f"batch axis {batch_axis} of shape {x.shape} is not "
                        f"divisible by the data-parallel mesh size {n}; pad "
                        "or drop the remainder before shard_batch(), or "
                        'pass on_indivisible="replicate" for eval batches'
                    )
                return jax.device_put(x, replicated_sharding(mesh))
            return jax.device_put(
                x, batch_sharding(mesh, batch_axis, x.ndim)
            )
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_sharding_for(x: Any, mesh: Mesh, min_size: int = 2**16) -> NamedSharding:
    """ZeRO/FSDP-style sharding for one parameter leaf: split the largest
    divisible axis across the ``data`` mesh axis; small or indivisible
    leaves stay replicated.  XLA inserts the all-gathers at use sites and
    reduce-scatters for the gradients."""
    n = mesh.shape["data"]
    shape = x.shape
    if np.prod(shape, dtype=np.int64) < min_size:
        return replicated_sharding(mesh)
    # largest axis divisible by the mesh size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % n == 0:
            spec = [None] * len(shape)
            spec[axis] = "data"
            return NamedSharding(mesh, P(*spec))
    return replicated_sharding(mesh)


def shard_params_fsdp(tree: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """Place a parameter/optimizer pytree with FSDP sharding (large leaves
    split across the ``data`` axis, small ones replicated)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, fsdp_sharding_for(x, mesh, min_size)), tree
    )
