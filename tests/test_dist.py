"""Distributed BA on the virtual 8-device CPU mesh: the feature-sharded
solver must match the single-device solver bit-for-bit in math (same
normal equations, same LM trajectory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfvio_tpu.backend import PriorFactor, SolverConfig, lm_solve
from lfvio_tpu.backend.state import NFRAMES, pose_dim
from lfvio_tpu.dist import make_feature_mesh, lm_solve_sharded, shard_grid
from tests.test_backend import (
    make_scene,
    project_to_grid,
    make_state,
    make_window_imu,
    F,
    G,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_solver_matches_single_device():
    p, v, q, pts_w, tic, qic = make_scene()
    grid, inv_depth = project_to_grid(p, q, pts_w, tic, qic)
    pre, si = make_window_imu(p, v, q)
    imu_valid = jnp.ones((NFRAMES - 1,), bool)
    truth = make_state(p, v, q, tic, qic, inv_depth)

    rng = np.random.default_rng(11)
    pert_p = np.asarray(p).copy()
    pert_p[1:] += rng.standard_normal((NFRAMES - 1, 3)) * 0.02
    bad_depth = inv_depth * jnp.asarray(rng.uniform(0.9, 1.1, F))
    state = make_state(pert_p, v, q, tic, qic, bad_depth)

    D = pose_dim(NFRAMES)
    prior = PriorFactor.from_state(
        jnp.eye(D, dtype=jnp.float64) * 1e4, jnp.zeros((D,), jnp.float64), truth
    )
    cfg = SolverConfig(max_iterations=6, estimate_td=False, estimate_extrinsic=False)

    ref_out, c0_ref, c1_ref, _ = lm_solve(
        state, grid, pre, si, imu_valid, prior, G, cfg
    )

    mesh = make_feature_mesh(jax.devices()[:8])
    out, c0, c1 = lm_solve_sharded(
        mesh, state, shard_grid(grid, mesh), pre, si, imu_valid, prior, G, cfg
    )

    np.testing.assert_allclose(float(c0), float(c0_ref), rtol=1e-10)
    np.testing.assert_allclose(float(c1), float(c1_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref_out.p), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(out.inv_depth), np.asarray(ref_out.inv_depth), atol=1e-8
    )
