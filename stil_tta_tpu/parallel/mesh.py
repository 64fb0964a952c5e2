"""SPMD data parallelism over a 1-axis ICI mesh.

The reference's distributed story is latent DDP with explicit NCCL
collectives (SURVEY.md §2.7: ``dist.all_reduce`` on prototype sums / DA
means, ``concat_all_gather`` for queues, ``dist.barrier``). The
TPU-native replacement is GSPMD: one ``Mesh(('data',))``, batches sharded
on the data axis, state replicated, and every cross-replica reduction
compiled by XLA from ordinary jnp reductions — no explicit collectives in
algorithm code, no barriers (SPMD lockstep).

The model here (~25M params, ResNet-50 + tiny transformers) needs only
DP for parity; tensor/pipeline parallelism would be wasted ICI traffic at
this size. ``create_mesh`` still accepts extra axes so larger encoders
can shard ('data', 'model') later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def create_hybrid_mesh(ici_size: int, dcn_size: int,
                       axis_names: Sequence[str] = ("dcn", "data")
                       ) -> Mesh:
    """Multi-slice mesh: outer axis across slices (DCN), inner axis
    within a slice (ICI). For the pure-DP workload here the batch is
    sharded over BOTH axes (``hierarchical_batch_sharding``) and XLA
    emits the hierarchical gradient reduction — reduce-scatter/all-reduce
    on ICI within each slice, then the (much smaller) cross-slice
    all-reduce over DCN. This is the standard multi-slice data-parallel
    recipe; no algorithm code changes (GSPMD inserts everything).

    Uses ``mesh_utils.create_hybrid_device_mesh`` on real multi-slice
    TPU topologies (it orders devices so the inner axis stays on ICI);
    falls back to a plain reshape on hosts without slice metadata
    (virtual CPU meshes in tests).
    """
    devices = jax.devices()
    try:
        from jax.experimental import mesh_utils
        dev = mesh_utils.create_hybrid_device_mesh(
            (1, ici_size), (dcn_size, 1), devices=devices)
    except Exception:
        dev = np.asarray(devices[:ici_size * dcn_size]).reshape(
            dcn_size, ici_size)
    return Mesh(dev, axis_names)


def hierarchical_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharded over every mesh axis (multi-slice DP)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place every array in the batch pytree with its leading dim sharded
    over the data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
