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
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
