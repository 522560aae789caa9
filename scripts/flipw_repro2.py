"""Engine-level flipw repro on TPU at reduced scale."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["MTTPU_SW_FLIPW"] = os.environ.get("REPRO_FLIPW", "1")

import jax
import jax.numpy as jnp

from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
from multitalent_tpu.ops.packed_unet import (make_inference_apply_fn,
                                             make_packed_inference_apply_fn)
from __graft_entry__ import _flagship_model

patch = tuple(int(v) for v in os.environ.get("REPRO_PATCH",
                                             "96,192,192").split(","))
vshape = tuple(int(v) for v in os.environ.get("REPRO_VOL",
                                              "128,224,224").split(","))
model = _flagship_model()
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, *patch, 1)))["params"]
apply_fn = make_inference_apply_fn(model)
pfn, pfac = make_packed_inference_apply_fn(model, patch)
predictor = SlidingWindowPredictor(
    apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
    step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
    use_gaussian=True, device=jax.devices()[0], packed_apply=(pfn, pfac))
vol = np.random.RandomState(0).randn(1, *vshape).astype(np.float32)
packed_dev, slicer = predictor.predict_to_device(params, volume_czyx=vol,
                                                 pack_threshold=0.5)
jax.block_until_ready(packed_dev)
np.asarray(jax.tree_util.tree_leaves(packed_dev)[0].ravel()[:1])
print("OK", flush=True)
