"""Test configuration: force JAX onto a virtual 8-device CPU platform so sharding and
collective code paths are exercised deterministically without TPU hardware
(the reference has no such capability — its multi-GPU paths need real GPUs)."""
import os
import sys

# Must be set before jax is imported anywhere. Accelerator plugins injected via
# site dirs (e.g. a tunnelled TPU) are stripped so the suite is deterministic and
# independent of accelerator availability.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if p and ".axon_site" not in p)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # XLA:CPU compile time dominates the suite (dozens of jitted 3D-conv
    # programs on a 1-core host); O0 cuts the worst test 92 -> 58 s and only
    # costs execution speed on tiny test shapes. Numerics are unaffected
    # (comparisons are tolerance-based and O0 if anything fuses less).
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The tunnelled-TPU sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon in the environment, so jax.config has already cached that
# value by the time this conftest runs — setting the env var above is then a
# no-op and the whole "CPU" suite silently runs through the remote TPU relay
# (glacial and flaky). Update the config directly; backends have not been
# initialized yet at collection time, so this is still allowed.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# XLA:CPU is pathologically slow compiling the hundreds of threefry2x32 calls
# a flax `init` of a deep net traces to (measured: SwinUNETR init 54.5 s to
# compile vs 9.6 s with rbg). The suite never pins values produced by a
# PRNGKey against stored constants (data comes from numpy RandomState; jax
# keys only seed inits and same-key A/B comparisons), so the cheap
# non-partitionable rbg generator is safe here. Production code is unaffected.
jax.config.update("jax_default_prng_impl", "rbg")
