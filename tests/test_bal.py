"""BAL bundle adjustment tests: projection model, file round-trip, and
LM convergence with Schur-eliminated points (reference
OptimizeBaAtLarge.cpp / BaAtLargeBench.cpp scenario)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from baspacho_tpu.bal import (BalProblem, build_ba_optimizer, load_bal,
                              make_random_bal, rodrigues_rotate, save_bal,
                              snavely_project)
from baspacho_tpu.optimizer import OptimizerSettings, BlockJacobiPrecond


def test_rodrigues_vs_matrix():
    rng = np.random.RandomState(0)
    for _ in range(5):
        r = rng.randn(3)
        x = rng.randn(3)
        theta = np.linalg.norm(r)
        k = r / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                      [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
        got = np.asarray(rodrigues_rotate(jnp.asarray(r), jnp.asarray(x)))
        assert np.max(np.abs(got - R @ x)) < 1e-12


def test_bal_roundtrip(tmp_path):
    p = make_random_bal(n_cams=3, n_pts=10, seed=1)
    path = os.path.join(tmp_path, "prob.txt")
    save_bal(path, p)
    q = load_bal(path)
    assert np.allclose(p.cameras, q.cameras)
    assert np.allclose(p.points, q.points)
    assert np.array_equal(p.obs_cam, q.obs_cam)
    assert np.allclose(p.obs_uv, q.obs_uv)


def test_ba_converges_from_noisy_init():
    prob = make_random_bal(n_cams=5, n_pts=60, track_len=4, seed=2)
    noisy = BalProblem(
        prob.cameras + np.random.RandomState(3).randn(*prob.cameras.shape)
        * np.array([1e-3, 1e-3, 1e-3, 1e-2, 1e-2, 1e-2, 0, 0, 0]),
        prob.points + np.random.RandomState(4).randn(*prob.points.shape)
        * 0.02,
        prob.obs_cam, prob.obs_pt, prob.obs_uv)
    opt, pts, cams = build_ba_optimizer(noisy)
    opt.build_solver(OptimizerSettings())
    assert opt.solver.sparse_elim_ranges[:2] == [0, 60]
    stats = opt.optimize(OptimizerSettings(max_iters=20))
    assert stats["final_cost"] < 1e-9


def test_ba_pcg_path_converges():
    prob = make_random_bal(n_cams=5, n_pts=60, track_len=4, seed=5)
    noisy = BalProblem(
        prob.cameras.copy(),
        prob.points + np.random.RandomState(6).randn(*prob.points.shape)
        * 0.02,
        prob.obs_cam, prob.obs_pt, prob.obs_uv)
    opt, _, _ = build_ba_optimizer(noisy)
    stats = opt.optimize(OptimizerSettings(
        max_iters=15, use_pcg=True, precond=BlockJacobiPrecond,
        pcg_tol=1e-10, pcg_max_iters=80))
    assert stats["final_cost"] < 1e-8
