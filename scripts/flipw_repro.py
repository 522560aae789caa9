"""Find which flip combo fails to compile on TPU (fusion_emitter pad check)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multitalent_tpu.ops.packed_unet import packed_unet_forward
from __graft_entry__ import _flagship_model

model = _flagship_model()
patch = (32, 64, 64)
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, *patch, 1)))["params"]
x = jnp.asarray(np.random.RandomState(0).randn(1, *patch, 1), jnp.float32)

combos = [(), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2)]
for c in combos:
    try:
        f = jax.jit(lambda p, v: packed_unet_forward(
            model, p, v, deep_supervision=False, packed_output=True,
            flip_combo=c))
        out = f(params, x)[0]
        np.asarray(out.ravel()[:1])
        print(f"combo={c}: OK", flush=True)
    except Exception as e:
        print(f"combo={c}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
