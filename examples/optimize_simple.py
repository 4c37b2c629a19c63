#!/usr/bin/env python
"""1-D spring chain demo (reference examples/OptimizeSimple.cpp): variables
x_i pulled to unit spacing by spring factors plus one anchor."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from baspacho_tpu.optimizer import (Optimizer, OptimizerSettings,
                                    VariableFamily)


def main(n=20):
    rng = np.random.RandomState(0)
    opt = Optimizer()
    xs = opt.add_variable_family(VariableFamily(rng.rand(n, 1) * 10))

    opt.add_factor_family(lambda a, b: (b - a) - 1.0,
                          [(xs, np.arange(n - 1)), (xs, np.arange(1, n))])
    opt.add_factor_family(lambda a: a, [(xs, np.array([0]))])

    stats = opt.optimize(OptimizerSettings(max_iters=25, verbose=True))
    print("final cost:", stats["final_cost"])
    print("solution:", np.asarray(opt.families[xs].values)[:, 0].round(6))


if __name__ == "__main__":
    main()
