#!/usr/bin/env python
"""Quick device-health probe: measures per-dispatch overhead and MXU
throughput with a tiny fixed program. Use before trusting any device
timing — the tunneled platform's dispatch latency varies from ~300 us to
multiple SECONDS between windows (measured 2026-08-17: a 42-GFLOP syrk
"took" 3 s in a bad window). Calibration and A/B runs are only
meaningful when this probe reports overhead in the low-ms range.

Prints one line: HEALTHY or DEGRADED with the numbers.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    x = jnp.asarray(np.random.RandomState(0).rand(1024, 1024)
                    .astype(np.float32))

    @jax.jit
    def mm(x):
        return x @ x

    def readback(r):
        float(np.asarray(r).ravel()[0])

    r = mm(x)
    readback(r)
    # per-dispatch: 20 queued dispatches, one readback
    t0 = time.perf_counter()
    for _ in range(20):
        r = mm(x)
    readback(r)
    per = (time.perf_counter() - t0) / 20
    # 1024^3*2 = 2.1 GFLOP per call
    tflops = 2.1e9 / per / 1e12
    healthy = per < 0.01
    print(f"{'HEALTHY' if healthy else 'DEGRADED'} "
          f"per-dispatch {per*1e3:.2f} ms  ({tflops:.1f} Tflop/s on "
          f"1k matmul)  device={dev}")
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
