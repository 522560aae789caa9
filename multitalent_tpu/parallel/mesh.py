"""Device mesh + sharding helpers: the TPU-native replacement for the reference's
DDP/NCCL plumbing.

The reference scales by spawning one process per GPU, wrapping the model in
DistributedDataParallel and hand-rolling an autograd all_gather for batch-dice
statistics (nnUNetTrainerV2_DDP.py:50-282, utilities/distributed.py:28-100). Here the
same data parallelism is expressed declaratively: one SPMD program compiled by XLA
over a `Mesh` with a single "data" axis. The global batch is sharded over the axis,
parameters are replicated, and every cross-device reduction in the loss (batch-dice
nominators/denominators, online-eval tp/fp/fn, gradient averaging) is inserted by XLA
as `psum` over ICI — no explicit collective calls in user code.

`distribute_batch_size` reproduces the `--dbs` batch/oversample splitting policy
(nnUNetTrainerV2_DDP.py:75-117) for the host-side samplers.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices; the unit of data parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) over the mesh; all other axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Device-put every array in `tree` with its leading axis sharded over the mesh."""
    s = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    """Device-put every array in `tree` fully replicated over the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def distribute_batch_size(global_batch_size: int, num_shards: int):
    """Split a global batch over shards with the reference's remainder policy and
    per-shard foreground-oversample fractions
    (nnUNetTrainerV2_DDP.set_batch_size_and_oversample, :75-117): shard i gets
    batch//N (+1 for the first batch%N shards); with global oversample fraction o,
    the *last* o-fraction of the global batch is foreground-forced, so each shard's
    local fraction is the overlap of its sample range with that tail.

    Returns (per_shard_batch_sizes, per_shard_oversample_fn) where
    per_shard_oversample_fn(global_oversample) -> list of per-shard fractions.
    """
    base = global_batch_size // num_shards
    rem = global_batch_size % num_shards
    sizes = [base + (1 if i < rem else 0) for i in range(num_shards)]

    def oversample_fractions(global_oversample: float) -> list[float]:
        cutoff = round(global_batch_size * (1 - global_oversample))
        fracs = []
        start = 0
        for bs in sizes:
            end = start + bs
            forced = max(0, end - max(cutoff, start))
            fracs.append(forced / bs if bs else 0.0)
            start = end
        return fracs

    return sizes, oversample_fractions
