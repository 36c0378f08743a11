"""Distributed BA on the virtual 8-device CPU mesh: the feature-sharded
solver must match the single-device solver bit-for-bit in math (same
normal equations, same LM trajectory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-long e2e runs; default suite skips

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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_tsqr_marginalization_matches_single_device():
    """The feature-sharded TSQR MARGIN_OLD prior must carry the same
    information (JᵀJ, Jᵀr — sign/rotation-invariant) as the single-device
    QR marginalization."""
    from lfvio_tpu.backend.marginalize import marginalize_old_qr
    from lfvio_tpu.dist import marginalize_old_qr_sharded

    p, v, q, pts_w, tic, qic = make_scene()
    grid, inv_depth = project_to_grid(p, q, pts_w, tic, qic)
    pre, si = make_window_imu(p, v, q)
    imu_valid = jnp.ones((NFRAMES - 1,), bool)
    state = make_state(p, v, q, tic, qic, inv_depth)
    D = pose_dim(NFRAMES)
    prior = PriorFactor.from_state(
        jnp.eye(D, dtype=jnp.float64) * 1e2, jnp.ones((D,), jnp.float64), state
    )
    cfg = SolverConfig(max_iterations=2, estimate_td=False, estimate_extrinsic=False)

    ref = marginalize_old_qr(state, grid, pre, si, imu_valid, prior, G, cfg)
    mesh = make_feature_mesh(jax.devices()[:8])
    got = marginalize_old_qr_sharded(
        mesh, state, shard_grid(grid, mesh), pre, si, imu_valid, prior, G, cfg
    )

    assert bool(got.valid)
    H_ref = np.asarray(ref.J).T @ np.asarray(ref.J)
    H_got = np.asarray(got.J).T @ np.asarray(got.J)
    b_ref = np.asarray(ref.J).T @ np.asarray(ref.r0)
    b_got = np.asarray(got.J).T @ np.asarray(got.r0)
    scale = np.abs(H_ref).max()
    np.testing.assert_allclose(H_got, H_ref, atol=1e-7 * scale)
    np.testing.assert_allclose(b_got, b_ref, atol=1e-7 * max(np.abs(b_ref).max(), 1.0))
    np.testing.assert_allclose(np.asarray(got.x0_p), np.asarray(ref.x0_p))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_full_sharded_frame_step_runs():
    """The complete distributed frame step (preint → triangulate → BA →
    gauge → TSQR marg) compiles and produces a finite, cost-decreasing
    solve on the 8-device mesh."""
    from lfvio_tpu.dist import vio_frame_step_sharded
    from lfvio_tpu.imu import ImuNoise

    p, v, q, pts_w, tic, qic = make_scene()
    grid, inv_depth = project_to_grid(p, q, pts_w, tic, qic)
    rng = np.random.default_rng(5)
    pert_p = np.asarray(p).copy()
    pert_p[1:] += rng.standard_normal((NFRAMES - 1, 3)) * 0.02
    state = make_state(pert_p, v, q, tic, qic, inv_depth)
    D = pose_dim(NFRAMES)
    prior = PriorFactor.from_state(
        jnp.eye(D, dtype=jnp.float64) * 1e4, jnp.zeros((D,), jnp.float64),
        make_state(p, v, q, tic, qic, inv_depth),
    )
    cfg = SolverConfig(max_iterations=4, estimate_td=False, estimate_extrinsic=False)

    # Raw IMU sample buffers (the sharded step preintegrates internally).
    W = NFRAMES - 1
    M = 24
    dts = np.full((W, M), 1.0 / (M * 15.0))
    accs = np.zeros((W, M, 3))
    gyrs = np.zeros((W, M, 3))
    import lfvio_tpu.geom as geom
    Gv = np.array([0.0, 0.0, 9.81])
    t = np.linspace(0, 1.0, NFRAMES)
    for i in range(W):
        a_w = (np.asarray(v)[i + 1] - np.asarray(v)[i]) / (t[i + 1] - t[i])
        R = np.asarray(geom.quat_to_mat(jnp.asarray(q[i])))
        accs[i] = R.T @ (a_w + Gv)
    a0 = accs[:, 0].copy()
    g0 = gyrs[:, 0].copy()
    imu_valid = jnp.ones((W,), bool)

    mesh = make_feature_mesh(jax.devices()[:8])
    sgrid = shard_grid(grid, mesh)
    out, new_prior, c0, c1 = vio_frame_step_sharded(
        mesh, state, sgrid,
        jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
        jnp.asarray(a0), jnp.asarray(g0), imu_valid,
        prior, jnp.zeros((F,), bool),
        jnp.asarray(pert_p[0]), jnp.asarray(q[0]),
        ImuNoise(0.02, 0.01, 0.04, 0.001), cfg,
        marg_old=True,
    )
    assert np.isfinite(float(c0)) and np.isfinite(float(c1))
    assert float(c1) <= float(c0)
    assert np.isfinite(np.asarray(out.p)).all()
    assert bool(new_prior.valid)
    assert np.isfinite(np.asarray(new_prior.J)).all()
