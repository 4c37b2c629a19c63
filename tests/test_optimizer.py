"""Optimizer-layer tests: LM on small factor graphs with known optima
(reference examples OptimizeSimple.cpp spring chain + PCG_Sample-style
Schur/PCG path), plus Jacobian/assembly cross-checks against dense
reference computation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from baspacho_tpu.optimizer import (
    Optimizer, OptimizerSettings, VariableFamily, HuberLoss, CauchyLoss,
    pcg, BlockJacobiPrecond, BlockGaussSeidelPrecond, SE3,
)


def build_spring_chain(n=12, seed=0):
    """1-D chain of springs: variables x_i (dim 1), factors pulling
    x_{i+1} - x_i to 1, plus an anchor x_0 -> 0."""
    rng = np.random.RandomState(seed)
    opt = Optimizer()
    xs = opt.add_variable_family(
        VariableFamily(rng.rand(n, 1) * 10, name="x"))

    def spring(a, b):
        return (b - a) - 1.0

    opt.add_factor_family(
        spring, [(xs, np.arange(n - 1)), (xs, np.arange(1, n))])

    def anchor(a):
        return a

    opt.add_factor_family(anchor, [(xs, np.array([0]))])
    return opt, xs


def test_spring_chain_converges():
    opt, xs = build_spring_chain()
    stats = opt.optimize(OptimizerSettings(max_iters=20))
    got = np.asarray(opt.families[xs].values)[:, 0]
    want = np.arange(len(got), dtype=float)
    assert stats["final_cost"] < 1e-16
    assert np.max(np.abs(got - want)) < 1e-7


def test_grad_hess_match_dense():
    """Assembled gradient/Hessian equal J^T r / J^T J computed densely."""
    opt, xs = build_spring_chain(n=6, seed=3)
    opt.build_solver(OptimizerSettings())
    values = [f.values for f in opt.families]
    cost, grad, hdata = opt.compute_grad_hess(values)

    # dense reference via autodiff of total residual vector
    x = np.asarray(values[0])[:, 0]

    def residuals(x):
        return jnp.concatenate([(x[1:] - x[:-1]) - 1.0, x[:1]])

    J = np.asarray(jax.jacfwd(residuals)(jnp.asarray(x)))
    r = np.asarray(residuals(jnp.asarray(x)))
    g_dense = J.T @ r
    h_dense = J.T @ J
    assert abs(float(cost) - 0.5 * float(r @ r)) < 1e-12

    # map user-order to internal: grad[internal_off[i]] = g_dense[i]
    acc = opt.solver.accessor()
    offs = np.asarray(acc.param_start(np.arange(len(x))))
    g_got = np.asarray(grad)[offs]
    assert np.max(np.abs(g_got - g_dense)) < 1e-12

    h_densified = opt.solver.skel.densify(np.asarray(hdata),
                                          fill_upper_half=True)
    # h_densified is in internal order; permute dense reference
    perm = np.asarray(opt.solver.permutation)  # user -> span
    span_off = np.asarray(acc.param_start(np.arange(len(x))))
    h_perm = np.zeros_like(h_dense)
    for i in range(len(x)):
        for j in range(len(x)):
            h_perm[span_off[i], span_off[j]] = h_dense[i, j]
    assert np.max(np.abs(h_densified - h_perm)) < 1e-12


def test_robust_loss_runs():
    opt, xs = build_spring_chain(n=8, seed=1)

    def outlier(a):
        return a - 100.0

    opt.add_factor_family(outlier, [(xs, np.array([4]))],
                          loss=CauchyLoss(1.0))
    stats = opt.optimize(OptimizerSettings(max_iters=25))
    got = np.asarray(opt.families[xs].values)[:, 0]
    # the robustified outlier factor must not drag x_4 to 100
    assert abs(got[4] - 4.0) < 0.5


def make_ba_problem(n_cams=4, n_pts=30, seed=0):
    """Tiny 3D bundle-adjustment-like problem: cameras as SE3, points in
    R^3, pinhole projection factors, noisy init."""
    rng = np.random.RandomState(seed)
    pts_gt = rng.rand(n_pts, 3) * 2 + np.array([0, 0, 4.0])
    cams_gt = []
    for i in range(n_cams):
        t = np.array([i * 0.5 - n_cams * 0.25, 0.1 * rng.randn(), 0.0])
        cams_gt.append(np.array([0, 0, 0, 1.0, *t]))
    cams_gt = np.stack(cams_gt)

    def project(cam, pt):
        p = SE3.transform(cam, pt)
        return p[:2] / p[2]

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        for p in range(n_pts):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_uv.append(np.asarray(project(jnp.asarray(cams_gt[c]),
                                             jnp.asarray(pts_gt[p]))))
    obs_uv = np.stack(obs_uv)

    opt = Optimizer()
    pts = opt.add_variable_family(VariableFamily(
        pts_gt + rng.randn(n_pts, 3) * 0.05, name="pts"))
    cams = opt.add_variable_family(VariableFamily(
        cams_gt, tangent_dim=6, tangent_step=SE3.tangent_step,
        name="cams"))

    def reproj(pt, cam, uv):
        return project(cam, pt) - uv

    opt.add_factor_family(
        reproj, [(pts, np.array(obs_pt)), (cams, np.array(obs_cam))],
        consts=(obs_uv,))
    # gauge fixing: anchor first camera with a strong prior factor
    def cam_prior(cam, target):
        return 10.0 * (cam - target)

    opt.add_factor_family(cam_prior, [(cams, np.array([0]))],
                          consts=(cams_gt[:1],))
    opt.set_elimination_families([pts])
    return opt, pts, cams


def test_ba_with_schur_elimination():
    opt, pts, cams = make_ba_problem()
    opt.build_solver(OptimizerSettings())
    assert opt.solver.sparse_elim_ranges[:2] == [0, 30]
    stats = opt.optimize(OptimizerSettings(max_iters=15))
    assert stats["final_cost"] < 1e-10


def test_ba_with_pcg_path():
    opt, pts, cams = make_ba_problem(seed=2)
    settings = OptimizerSettings(max_iters=15, use_pcg=True,
                                 precond=BlockJacobiPrecond,
                                 pcg_tol=1e-10, pcg_max_iters=60)
    stats = opt.optimize(settings)
    assert stats["final_cost"] < 1e-8


def test_pcg_standalone():
    rng = np.random.RandomState(0)
    n = 40
    a = rng.rand(n, n)
    a = a @ a.T + np.eye(n) * n
    b = rng.rand(n)
    x, r2, iters = pcg(lambda v: v / jnp.asarray(np.diag(a)),
                       lambda v: jnp.asarray(a) @ v,
                       jnp.asarray(b), 1e-12, 200)
    assert np.max(np.abs(np.asarray(x) - np.linalg.solve(a, b))) < 1e-7
