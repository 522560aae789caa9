"""A/B the merged-tap TRAINING forward (MTTPU_MERGED_TRAIN) on hardware:
full train-step time + loss/grad agreement, liver dummyLoad protocol.

Usage: python scripts/merged_train_ab.py [config]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(config):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from bench import TRAIN_CONFIGS
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import make_train_forward_fn
    from multitalent_tpu.training.losses import (dc_and_ce_loss,
                                                 deep_supervision_loss,
                                                 ds_loss_weights)
    from multitalent_tpu.augment.pipeline import ds_scales_from_pools

    cfg = TRAIN_CONFIGS[config]
    patch, pools, base, n_classes = cfg[0], cfg[1], cfg[2], cfg[3]
    convs = cfg[6] if len(cfg) > 6 else ((3, 3, 3),) * (len(pools) + 1)
    in_ch = cfg[7] if len(cfg) > 7 else 1
    model = GenericUNet(input_channels=in_ch, base_num_features=base,
                        num_classes=n_classes, pool_op_kernel_sizes=pools,
                        conv_kernel_sizes=convs, deep_supervision=True,
                        dtype=jnp.bfloat16)
    forward = make_train_forward_fn(model)
    weights = [float(w) for w in ds_loss_weights(len(pools),
                                                 mask_lowest=True)]

    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *patch, in_ch)))["params"]

    def loss_fn(params, data, targets):
        outputs = forward(params, data, deterministic=False)
        return deep_supervision_loss(
            outputs, targets, partial(dc_and_ce_loss, batch_dice=False),
            weights)

    grad = jax.jit(jax.value_and_grad(loss_fn))
    host = np.random.RandomState(0)
    data = jnp.asarray(host.randn(2, *patch, in_ch).astype(np.float32))
    ds_scales = ds_scales_from_pools(pools)
    targets = []
    for s in ds_scales[: len(weights)]:
        shp = [max(1, int(round(p * sc))) for p, sc in zip(patch, s)]
        targets.append(jnp.asarray(
            host.randint(0, n_classes, (2, *shp)).astype(np.float32)))
    return grad, params, data, targets


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "liver"
    import jax
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    print(f"# device={jax.devices()[0]} config={config}", flush=True)

    results = {}
    for arm, env in (("dense", "0"), ("merged", "1")):
        os.environ["MTTPU_MERGED_TRAIN"] = env
        grad, params, data, targets = build_step(config)
        t0 = time.time()
        loss, g = grad(params, data, targets)
        lval = float(loss)
        print(f"# {arm}: warmup {time.time()-t0:.1f} s loss {lval:.6f}",
              flush=True)
        n = 10
        t0 = time.time()
        for _ in range(n):
            loss, g = grad(params, data, targets)
        lval = float(loss)
        dt = (time.time() - t0) / n
        gflat = np.concatenate([np.asarray(v, np.float32).ravel()[:512]
                                for v in jax.tree_util.tree_leaves(g)])
        results[arm] = (dt, lval, gflat)
        print(f"{arm:8s} {dt*1e3:7.1f} ms/iter  loss {lval:.6f}", flush=True)
    os.environ.pop("MTTPU_MERGED_TRAIN", None)

    (dt_d, l_d, g_d), (dt_m, l_m, g_m) = results["dense"], results["merged"]
    rel = np.abs(g_m - g_d) / (np.abs(g_d).max() + 1e-8)
    print(f"speedup {dt_d/dt_m:.3f}x  dloss {abs(l_m-l_d):.2e}  "
          f"grad maxrel {rel.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
