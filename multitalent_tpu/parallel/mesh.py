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


class BatchShardingPlan:
    """Mesh + shardings chosen for a (global batch, patch) pair.

    Attributes:
      mesh: the chosen Mesh (axes "data" and possibly "space"), or None when
        single-device execution was selected.
      volume_sharding: NamedSharding for 5-D (b, c, *spatial) host batch
        arrays — batch axis only. Host batches may be rotation-enlarged to
        odd sizes (get_patch_size), so spatial sharding is NOT applied at
        device_put time; it enters via `activation_sharding` inside the step,
        after augmentation has cropped to the final (divisible) patch.
      batch_sharding: NamedSharding for arrays whose only sharded axis is the
        leading batch axis (e.g. MultiTalent's (b, R) valid-region mask).
      space_axis: patch axis index sharded over the "space" mesh axis (None
        for batch-only plans).
      description: human-readable policy statement for the training log.
    """

    def __init__(self, mesh, batch_sharding, description, space_axis=None,
                 n_spatial_dims=3):
        self.mesh = mesh
        self.volume_sharding = batch_sharding
        self.batch_sharding = batch_sharding
        self.space_axis = space_axis
        self._n_spatial_dims = n_spatial_dims
        self.description = description

    def activation_sharding(self, channels_last: bool = True):
        """NamedSharding for network activations of the final patch size —
        (b, *patch, c) when channels_last — used as a
        `jax.lax.with_sharding_constraint` inside the jitted step so XLA's
        SPMD partitioner spatially partitions the network (conv halo
        exchanges) instead of replicating it over the "space" axis. None when
        the plan has no spatial factor."""
        if self.space_axis is None:
            return None
        spec = [None] * (2 + self._n_spatial_dims)
        spec[0] = "data"
        spec[(1 if channels_last else 2) + self.space_axis] = "space"
        return NamedSharding(self.mesh, P(*spec))

    def constrain_activations(self, x, channels_last: bool = True):
        """Apply inside the jitted step between augmentation and the network.

        Two constraints, deliberately: first pin `x` to batch-only sharding so
        the upstream on-device augmentation partitions over the batch axis
        only (its warp gathers are comm-heavy under spatial partitioning, and
        XLA:CPU's SPMD partitioner has been observed to MISCOMPILE them —
        inf/NaN outputs for rotation-dependent gather patterns); then an
        explicit reshard to the (data, space) layout the network computes in.
        No-op for plans without a spatial factor."""
        act = self.activation_sharding(channels_last)
        if act is None:
            return x
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P("data")))
        return jax.lax.with_sharding_constraint(x, act)


def compile_train_step(plan, augment, train_core, *, donate_argnums=(0,),
                       core_out_shardings=None):
    """THE way to jit a train step that starts with on-device augmentation.

    Contract: augment(rng, data, seg) -> (data, targets);
    train_core(state, data, targets, *extras) -> anything. Returns
    step(state, rng, data, seg, *extras).

    Spatially-sharded plans (plan.space_axis set) compile the augmentation as
    its OWN batch-only program: a downstream with_sharding_constraint cannot
    stop the SPMD partitioner from choosing spatial shardings INSIDE the
    augmentation, and XLA's partitioner has been observed to miscompile the
    rotation warp's gather patterns under spatial sharding (key-dependent
    inf/NaN outputs). Pinning the whole augment program's outputs to
    batch-only sharding removes the spatial axis from its partitioning search
    entirely, at the cost of one extra dispatch per iteration (multi-device
    runs only). Every caller that mixes augmentation with a spatial mesh MUST
    come through here so the fence is structural, not conventional
    (regression test: tests/test_parallel_training.py hybrid-mesh NaN)."""
    if plan is not None and plan.space_axis is not None:
        aug_fn = jax.jit(augment, out_shardings=plan.batch_sharding)
        core_kw = {}
        if core_out_shardings is not None:
            core_kw["out_shardings"] = core_out_shardings
        core_fn = jax.jit(train_core, donate_argnums=donate_argnums,
                          **core_kw)

        def step(state, rng, data, seg, *extras):
            data, targets = aug_fn(rng, data, seg)
            return core_fn(state, data, targets, *extras)

        return step

    def fused(state, rng, data, seg, *extras):
        data, targets = augment(rng, data, seg)
        return train_core(state, data, targets, *extras)

    kw = {}
    if core_out_shardings is not None:
        kw["out_shardings"] = core_out_shardings
    return jax.jit(fused, donate_argnums=donate_argnums, **kw)


def plan_batch_sharding(global_batch_size: int, patch_size, devices=None):
    """Pick a mesh and input shardings for one SPMD train step.

    The reference's DDP can only split the batch across ranks, so bs4 on 8
    GPUs is impossible (`--dbs` gives some ranks an empty batch); round 1 of
    this rebuild silently fell back to ONE device in that case. TPU-native
    fix: factor the device count into a 2-D (data, space) mesh —
    data = gcd(batch, n_dev) shards the batch, space = n_dev // data shards a
    spatial axis of the patch, and XLA's SPMD partitioner inserts the halo
    exchanges for the convolutions. The math is identical to single-device
    execution (grads/loss bit-comparable up to reduction order); every device
    does useful work for any batch size.

    Spatial axis choice: the largest patch axis divisible by the space factor
    (prefer later axes — y/x are the big 192s in the flagship plans). When no
    axis divides evenly, fall back to batch-only sharding over the gcd devices
    and leave the rest idle (logged loudly).
    """
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    bs = int(global_batch_size)
    if n_dev <= 1:
        return None
    d = int(np.gcd(bs, n_dev))
    s = n_dev // d
    patch = [int(p) for p in patch_size]
    if s == 1:
        mesh = Mesh(np.asarray(devices).reshape(-1), ("data",))
        return BatchShardingPlan(
            mesh, NamedSharding(mesh, P("data")),
            f"data-parallel over {n_dev} devices (local batch {bs // n_dev})",
            n_spatial_dims=len(patch))
    # find a spatial axis divisible by s; prefer the largest extent
    candidates = [(p, ax) for ax, p in enumerate(patch) if p % s == 0]
    if candidates:
        _, ax = max(candidates)
        mesh = Mesh(np.asarray(devices).reshape(d, s), ("data", "space"))
        return BatchShardingPlan(
            mesh, NamedSharding(mesh, P("data")),
            f"hybrid data x spatial parallelism over {n_dev} devices: batch {bs} "
            f"sharded {d}-way, patch axis {ax} (size {patch[ax]}) sharded "
            f"{s}-way (XLA inserts conv halo exchanges)",
            space_axis=ax, n_spatial_dims=len(patch))
    if d == 1:
        return None
    mesh = Mesh(np.asarray(devices)[:d].reshape(-1), ("data",))
    return BatchShardingPlan(
        mesh, NamedSharding(mesh, P("data")),
        f"WARNING: batch {bs} not divisible over {n_dev} devices and no patch "
        f"axis divides {s}; data-parallel over {d} devices, {n_dev - d} idle",
        n_spatial_dims=len(patch))


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
