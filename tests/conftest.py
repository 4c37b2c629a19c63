"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Real-TPU behavior is exercised by bench.py / __graft_entry__.py; tests
validate numerics (float64 oracles need CPU) and multi-device sharding
(8 virtual devices, mirroring the driver's dryrun_multichip harness).
"""

import os
import sys

# force host CPU (numeric oracles need native float64; the surrounding
# environment may preset a TPU platform) and detach any remote-compile
# relay hooks so a wedged tunnel can't stall CPU-only test runs
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
sys.path[:] = [p for p in sys.path if "axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if "axon_site" not in p)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
