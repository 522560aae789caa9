"""Sharded training must be numerically equivalent to single-device training.

Round 1's trainer built a mesh only when `batch_size % n_devices == 0`, so the
flagship MultiTalent configuration (bs4 plans on an 8-chip pod) silently
trained on ONE device. The fix (`parallel/mesh.plan_batch_sharding`) factors
the device count into a (data, space) mesh — batch over gcd(bs, n_dev),
a spatial patch axis over the rest — with XLA's SPMD partitioner inserting the
conv halo exchanges. These tests pin (a) the policy choices and (b) that the
sharded step's loss and gradients match the single-device step.

Reference semantics being replaced: nnUNetTrainerV2_DDP.set_batch_size_and_
oversample (nnUNetTrainerV2_DDP.py:75-117), which cannot express bs < n_ranks.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multitalent_tpu.parallel.mesh import plan_batch_sharding

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU pool")


def test_policy_even_batch_is_pure_dp():
    plan = plan_batch_sharding(8, (96, 192, 192), devices=jax.devices()[:8])
    assert dict(plan.mesh.shape) == {"data": 8}
    assert "data-parallel over 8" in plan.description


def test_policy_flagship_bs4_on_8_is_hybrid():
    plan = plan_batch_sharding(4, (96, 192, 192), devices=jax.devices()[:8])
    assert dict(plan.mesh.shape) == {"data": 4, "space": 2}
    assert "hybrid" in plan.description


def test_policy_spatial_only_when_coprime():
    plan = plan_batch_sharding(3, (8, 16, 16), devices=jax.devices()[:8])
    assert dict(plan.mesh.shape) == {"data": 1, "space": 8}


def test_policy_fallback_idles_devices_when_nothing_divides():
    plan = plan_batch_sharding(2, (7, 9, 11), devices=jax.devices()[:4])
    assert dict(plan.mesh.shape) == {"data": 2}
    assert "idle" in plan.description


def _loss_and_grads(plan, batch=4, patch=(8, 16, 16)):
    """One full production train-step computation (on-device augmentation +
    forward + DS DC+CE with batch dice + grads) on the given sharding plan
    (None = single device). fp32 so cross-layout reduction order is the only
    source of difference."""
    from multitalent_tpu.augment.params import default_3D_augmentation_params
    from multitalent_tpu.augment.pipeline import (ds_scales_from_pools,
                                                  make_augment_fn)
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.training.losses import (dc_and_ce_loss,
                                                 deep_supervision_loss,
                                                 ds_loss_weights)

    pools = ((2, 2, 2), (1, 2, 2))
    model = GenericUNet(input_channels=1, base_num_features=4, num_classes=5,
                        pool_op_kernel_sizes=pools,
                        conv_kernel_sizes=((3, 3, 3),) * 3,
                        deep_supervision=True, dtype=jnp.float32)
    augment = make_augment_fn(patch, ds_scales_from_pools(pools),
                              dict(default_3D_augmentation_params), 1)
    weights = [float(w) for w in ds_loss_weights(len(pools), mask_lowest=True)]

    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, *patch, 1))
    params = jax.jit(model.init)(rng, example)["params"]

    def compute(params, rng, data, seg):
        data, targets = augment(rng, data, seg)
        if plan is not None:
            data = plan.constrain_activations(data)
        outputs = model.apply({"params": params}, data, deterministic=True)
        return deep_supervision_loss(
            outputs, targets, partial(dc_and_ce_loss, batch_dice=True), weights)

    host = np.random.RandomState(0)
    data = host.randn(batch, 1, *patch).astype(np.float32)
    seg = host.randint(0, 5, (batch, 1, *patch)).astype(np.float32)
    step_rng = jax.random.PRNGKey(7)

    if plan is not None:
        data = jax.device_put(data, plan.volume_sharding)
        seg = jax.device_put(seg, plan.volume_sharding)

    loss, grads = jax.jit(jax.value_and_grad(compute))(params, step_rng,
                                                       data, seg)
    return float(loss), jax.device_get(grads)


@pytest.mark.slow
def test_flagship_bs4_sharded_step_matches_single_device():
    plan = plan_batch_sharding(4, (8, 16, 16), devices=jax.devices()[:8])
    assert dict(plan.mesh.shape) == {"data": 4, "space": 2}
    loss_ref, grads_ref = _loss_and_grads(None)
    loss_sh, grads_sh = _loss_and_grads(plan)
    assert np.isclose(loss_ref, loss_sh, rtol=1e-5), (loss_ref, loss_sh)
    for a, b in zip(jax.tree_util.tree_leaves(grads_ref),
                    jax.tree_util.tree_leaves(grads_sh)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_constrained_augment_values_unchanged():
    """Regression: a bare spatial with_sharding_constraint after the cascade
    augmentation let XLA:CPU's SPMD partitioner back-propagate spatial
    sharding into the warp gathers, which MISCOMPILED (inf outputs) for
    rotation-dependent gather patterns (~50% of rng draws).
    BatchShardingPlan.constrain_activations pins the augment to batch-only
    sharding first; its output must equal the unconstrained computation for
    every rng draw."""
    from multitalent_tpu.augment.params import default_3D_augmentation_params
    from multitalent_tpu.augment.pipeline import (ds_scales_from_pools,
                                                  make_cascade_augment_fn)

    patch = (8, 8, 8)
    plan = plan_batch_sharding(2, patch, devices=jax.devices()[:8])
    assert dict(plan.mesh.shape) == {"data": 2, "space": 4}
    augf = make_cascade_augment_fn(patch, ds_scales_from_pools(((2, 2, 2),)),
                                   dict(default_3D_augmentation_params), 1, 2)

    host = np.random.RandomState(3)
    data = host.randn(2, 1, 14, 14, 14).astype(np.float32)
    gt = host.randint(0, 3, (2, 14, 14, 14)).astype(np.float32)
    gt[:, :2] = -1  # sampler pad marker
    prev = (host.rand(2, 14, 14, 14) > 0.7).astype(np.float32)
    seg = np.stack([gt, prev], 1)

    def constrained(rng, d, s):
        x, _ = augf(rng, d, s)
        return plan.constrain_activations(x)

    def plain(rng, d, s):
        return augf(rng, d, s)[0]

    f_c = jax.jit(constrained)
    f_p = jax.jit(plain)
    rng = jax.random.PRNGKey(12345 + 777)
    d_sh = jax.device_put(data, plan.volume_sharding)
    s_sh = jax.device_put(seg, plan.volume_sharding)
    # 4 draws ~= 94% chance of hitting a miscompiling rotation pattern (each
    # draw trips it w.p. ~0.5); execution of the 8-device warp is the cost
    for _ in range(4):
        rng, sub = jax.random.split(rng)
        xc = np.asarray(f_c(sub, d_sh, s_sh), np.float32)
        xp = np.asarray(f_p(sub, data, seg), np.float32)
        assert np.isfinite(xc).all()
        np.testing.assert_allclose(xc, xp, atol=1e-5)


@pytest.mark.slow
def test_trainer_uses_hybrid_mesh_for_bs4(tmp_path):
    """The production TrainerV2 must pick up the hybrid plan for a bs4 plans
    file on the 8-device pool and train (not silently drop to one device)."""
    from tests.test_training import make_preprocessed, tiny_plans
    from multitalent_tpu.training.trainers import TrainerV2

    class OneIter(TrainerV2):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.max_num_epochs = 1
            self.num_batches_per_epoch = 1
            self.num_val_batches_per_epoch = 1

    dd = make_preprocessed(tmp_path, n_cases=4)
    t = OneIter(tiny_plans(batch_size=4, patch=(8, 16, 16)), 0,
                str(tmp_path / "out"), dd)
    t.initialize(True)
    assert t._mesh is not None
    assert dict(t._mesh.shape) == {"data": 4, "space": 2}
    loss = t.run_iteration(t.tr_gen, True)
    assert np.isfinite(loss)
    t.tr_gen.stop()
    t.val_gen.stop()
