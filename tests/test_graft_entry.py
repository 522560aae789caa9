"""The driver-facing entry points must work in-suite, hermetically.

Round 1's driver check failed (MULTICHIP_r01.json ok=false) because
``dryrun_multichip`` let eager ops touch a tunnelled accelerator backend before
its CPU fallback ran. These tests pin the fix: the function must run green on
the virtual CPU pool regardless of host accelerator state.
"""
import numpy as np
import pytest


@pytest.mark.slow  # ~18 s sharded train-step compile; the driver also runs
def test_dryrun_multichip_8():  # dryrun_multichip(N) independently every round
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import jax

    import __graft_entry__
    fn, (params, x) = __graft_entry__.entry()
    out = jax.jit(fn).lower(params, x).compile()(params, x)
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))
