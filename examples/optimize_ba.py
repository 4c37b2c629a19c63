#!/usr/bin/env python
"""Bundle adjustment demo (reference examples/OptimizeBaAtLarge.cpp):
loads a BAL file (or generates a synthetic scene), Schur-eliminates the
landmarks, and runs Levenberg-Marquardt with a Huber loss.

Usage: python examples/optimize_ba.py [path/to/problem.txt[.gz]]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from baspacho_tpu.bal import build_ba_optimizer, load_bal, make_random_bal
from baspacho_tpu.optimizer import OptimizerSettings


def main():
    if len(sys.argv) > 1:
        prob = load_bal(sys.argv[1])
    else:
        prob = make_random_bal(n_cams=8, n_pts=200, track_len=5, seed=0,
                               noise=0.5)
    print(f"cameras={prob.num_cameras} points={prob.num_points} "
          f"observations={prob.num_observations}")
    opt, pts, cams = build_ba_optimizer(prob, huber=100.0)
    stats = opt.optimize(OptimizerSettings(max_iters=20, verbose=True))
    print("final cost:", stats["final_cost"])


if __name__ == "__main__":
    main()
