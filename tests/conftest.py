"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Real-TPU behavior is exercised by bench.py / __graft_entry__.py; tests
validate numerics (float64 oracles need CPU) and multi-device sharding
(8 virtual devices, mirroring the driver's dryrun_multichip harness).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
