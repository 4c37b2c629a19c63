"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Real-TPU behavior is exercised by bench.py / __graft_entry__.py; tests
validate numerics (float64 oracles need CPU) and multi-device sharding
(8 virtual devices, mirroring the driver's dryrun_multichip harness).
"""

import os
import sys

# `pytest -m tpu tests/` runs the marker-gated on-device slice
# (tests/test_tpu_device.py) on the REAL chip under the ambient platform:
# no CPU scrub, no x64, f32/MXU epsilons — asserting the accuracy
# contract where the MXU rounding actually happens.
_TPU_MODE = False
for _i, _a in enumerate(sys.argv):
    if (_a == "-m" and _i + 1 < len(sys.argv)
            and sys.argv[_i + 1].strip() == "tpu") \
            or _a in ("-mtpu", "-m=tpu"):
        _TPU_MODE = True

# Tests must run on host CPU (numeric oracles need native float64) with
# no remote-compile relay hooks: some environments install a sitecustomize
# (via PYTHONPATH) that routes EVERY XLA compile through a TPU tunnel at
# interpreter startup — far too early for in-process cleanup. Re-exec the
# interpreter once with a scrubbed environment in that case.
_NEEDS_CLEAN_RELAUNCH = (
    not _TPU_MODE
    and "axon_site" in os.environ.get("PYTHONPATH", "")
    and not os.environ.get("_BASPACHO_TPU_CLEAN_REEXEC"))


def pytest_configure(config):
    """Register the tpu marker; relaunch the test run in a scrubbed
    environment when a TPU remote-compile sitecustomize is active (it
    hooks every XLA compile at interpreter start — too early for
    in-process cleanup)."""
    config.addinivalue_line(
        "markers", "tpu: on-device accuracy tests (run: pytest -m tpu)")
    if not _NEEDS_CLEAN_RELAUNCH:
        return
    import subprocess

    env = dict(os.environ)
    env["_BASPACHO_TPU_CLEAN_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if "axon_site" not in p)
    args = sys.argv[1:] if sys.argv and "pytest" in sys.argv[0] \
        else sys.argv
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    rc = subprocess.run([sys.executable, "-m", "pytest"] + args,
                        env=env).returncode
    os._exit(rc)

if not _TPU_MODE:
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


def pytest_collection_modifyitems(config, items):
    """Default (CPU) runs skip the on-device slice; `-m tpu` runs select
    it via the marker expression and skip everything unmarked."""
    if _TPU_MODE:
        return
    import pytest
    skip_tpu = pytest.mark.skip(reason="on-device test; run: pytest -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
