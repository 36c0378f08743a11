import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lfvio_tpu import geom
from lfvio_tpu.backend import (
    WindowState,
    FeatureGrid,
    PriorFactor,
    SolverConfig,
    projection_residuals_grid,
    lm_solve,
)
from lfvio_tpu.backend.state import NFRAMES
from lfvio_tpu.backend.solver import assemble_normal_equations, total_cost
from lfvio_tpu.backend.marginalize import marginalize_old
from lfvio_tpu.imu import ImuNoise, preintegrate, imu_residual

G = jnp.asarray([0.0, 0.0, 9.81])
NOISE = ImuNoise(0.02, 0.01, 0.04, 0.001)
F = 64  # feature slots for tests


def make_scene(seed=0, n_feat=F, spread=2.0):
    """Ground-truth window: smooth forward trajectory + random landmarks on
    the full sphere (including negative-z 'behind' points, PAL-style)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1.0, NFRAMES)
    p = np.stack([t * 1.0, 0.15 * np.sin(2 * t), 0.1 * t], axis=-1)
    v = np.gradient(p, t, axis=0)
    theta = np.stack([0.08 * np.sin(3 * t), 0.1 * t, 0.15 * np.sin(2 * t)], -1)
    q = np.asarray(geom.so3_exp(jnp.asarray(theta)))

    # Landmarks in a shell around the trajectory, all directions.
    dirs = rng.standard_normal((n_feat, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radius = rng.uniform(3.0, 8.0, (n_feat, 1))
    pts_w = p.mean(0) + dirs * radius * spread / 2.0

    tic = np.array([0.02, -0.01, 0.03])
    qic = np.asarray(geom.so3_exp(jnp.asarray([0.02, -0.7, 0.01])))
    return p, v, q, pts_w, tic, qic


def project_to_grid(p, q, pts_w, tic, qic, noise_px=0.0, seed=1):
    """Build the FeatureGrid of exact unit bearings for all frames."""
    rng = np.random.default_rng(seed)
    n_feat = pts_w.shape[0]
    bearings = np.zeros((n_feat, NFRAMES, 3))
    for j in range(NFRAMES):
        Rj = np.asarray(geom.quat_to_mat(jnp.asarray(q[j])))
        Ric = np.asarray(geom.quat_to_mat(jnp.asarray(qic)))
        pts_imu = (pts_w - p[j]) @ Rj  # R_j^T (X - p_j)
        pts_cam = (pts_imu - tic) @ Ric
        b = pts_cam / np.linalg.norm(pts_cam, axis=-1, keepdims=True)
        if noise_px > 0:
            b = b + rng.standard_normal(b.shape) * noise_px / 160.0
            b /= np.linalg.norm(b, axis=-1, keepdims=True)
        bearings[:, j] = b
    grid = FeatureGrid(
        bearing=jnp.asarray(bearings),
        velocity=jnp.zeros((n_feat, NFRAMES, 3)),
        td_obs=jnp.zeros((n_feat, NFRAMES)),
        valid=jnp.ones((n_feat, NFRAMES), bool),
        anchor=jnp.zeros((n_feat,), jnp.int32),
        used=jnp.ones((n_feat,), bool),
    )
    # True inverse ray depth at the anchor frame (frame 0).
    R0 = np.asarray(geom.quat_to_mat(jnp.asarray(q[0])))
    Ric = np.asarray(geom.quat_to_mat(jnp.asarray(qic)))
    pts_cam0 = ((pts_w - p[0]) @ R0 - tic) @ Ric
    inv_depth = 1.0 / np.linalg.norm(pts_cam0, axis=-1)
    return grid, jnp.asarray(inv_depth)


def make_state(p, v, q, tic, qic, inv_depth):
    return WindowState(
        p=jnp.asarray(p), q=jnp.asarray(q), v=jnp.asarray(v),
        ba=jnp.zeros((NFRAMES, 3)), bg=jnp.zeros((NFRAMES, 3)),
        tic=jnp.asarray(tic), qic=jnp.asarray(qic),
        td=jnp.zeros(()), inv_depth=inv_depth,
    )


def make_window_imu(p, v, q, rate=200.0, frame_dt=0.1):
    """Exact IMU preintegrations for each window interval from spline-like
    interpolation of the test trajectory (piecewise-constant acceleration)."""
    n_samp = int(rate * frame_dt)
    pres = []
    sqrt_infos = []
    for i in range(NFRAMES - 1):
        dt = frame_dt / n_samp
        # Piecewise linear v between frames => constant world acceleration.
        a_w = (v[i + 1] - v[i]) / frame_dt
        dq_tot = geom.quat_mul(geom.quat_conj(jnp.asarray(q[i])), jnp.asarray(q[i + 1]))
        omega = np.asarray(geom.so3_log(dq_tot)) / frame_dt  # body-frame const
        accs, gyrs = [], []
        for k in range(n_samp + 1):
            s = k / n_samp
            qk = geom.quat_mul(jnp.asarray(q[i]), geom.so3_exp(jnp.asarray(omega * (s * frame_dt))))
            Rk = np.asarray(geom.quat_to_mat(qk))
            accs.append(Rk.T @ (a_w + np.asarray(G)))
            gyrs.append(omega)
        accs, gyrs = np.asarray(accs), np.asarray(gyrs)
        pre = preintegrate(
            jnp.full((n_samp,), dt), jnp.asarray(accs[1:]), jnp.asarray(gyrs[1:]),
            jnp.asarray(accs[0]), jnp.asarray(gyrs[0]),
            jnp.zeros(3), jnp.zeros(3), NOISE,
        )
        pres.append(pre)
        cov = np.asarray(pre.covariance)
        sqrt_info = np.linalg.cholesky(np.linalg.inv(cov)).T
        sqrt_infos.append(sqrt_info)
    pre_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    return pre_stack, jnp.asarray(np.asarray(sqrt_infos))


def dummy_imu_zero():
    """Disabled IMU factors (imu_valid all False)."""
    W = NFRAMES - 1
    pre = preintegrate(
        jnp.zeros((2,)), jnp.zeros((2, 3)), jnp.zeros((2, 3)),
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), NOISE,
    )
    pre_stack = jax.tree_util.tree_map(lambda x: jnp.stack([x] * W), pre)
    return pre_stack, jnp.tile(jnp.eye(15), (W, 1, 1)), jnp.zeros((W,), bool)


CFG = SolverConfig(max_iterations=8)


def test_projection_residual_zero_at_truth():
    p, v, q, pts_w, tic, qic = make_scene()
    grid, inv_depth = project_to_grid(p, q, pts_w, tic, qic)
    state = make_state(p, v, q, tic, qic, inv_depth)
    res, valid = projection_residuals_grid(state, grid, CFG.proj_sqrt_info)
    assert np.abs(np.asarray(res)).max() < 1e-8
    assert int(valid.sum()) == F * (NFRAMES - 1)


def test_imu_residual_zero_at_truth():
    p, v, q, pts_w, tic, qic = make_scene()
    pre, sqrt_info = make_window_imu(p, v, q)
    for i in range(NFRAMES - 1):
        pre_i = jax.tree_util.tree_map(lambda x: x[i], pre)
        r = imu_residual(
            pre_i,
            jnp.asarray(p[i]), jnp.asarray(q[i]), jnp.asarray(v[i]),
            jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(p[i + 1]), jnp.asarray(q[i + 1]), jnp.asarray(v[i + 1]),
            jnp.zeros(3), jnp.zeros(3), G,
        )
        assert np.abs(np.asarray(r)).max() < 3e-3, (i, np.asarray(r))


def test_lm_recovers_perturbed_depths():
    """Vision-only, poses at truth, depths perturbed: LM must recover them."""
    p, v, q, pts_w, tic, qic = make_scene()
    grid, inv_depth = project_to_grid(p, q, pts_w, tic, qic)
    rng = np.random.default_rng(3)
    bad_depth = inv_depth * jnp.asarray(rng.uniform(0.7, 1.4, F))
    state = make_state(p, v, q, tic, qic, bad_depth)
    pre, si, imu_valid = dummy_imu_zero()
    # Pin every pose with a strong prior at the truth so the only free
    # variables are the depths (otherwise the gauge lets poses drift).
    from lfvio_tpu.backend.state import pose_dim
    truth = make_state(p, v, q, tic, qic, inv_depth)
    D = pose_dim(NFRAMES)
    prior = PriorFactor.from_state(
        jnp.eye(D, dtype=jnp.float64) * 1e5, jnp.zeros((D,), jnp.float64), truth
    )
    cfg = SolverConfig(max_iterations=8, estimate_td=False, estimate_extrinsic=False)
    out, c0, c1, hist = lm_solve(state, grid, pre, si, imu_valid, prior, G, cfg)
    assert float(c1) < 1e-8 * max(float(c0), 1.0), (float(c0), float(c1))
    np.testing.assert_allclose(
        np.asarray(out.inv_depth), np.asarray(inv_depth), atol=1e-6
    )


@pytest.mark.slow
def test_lm_full_recovers_perturbed_window():
    """Vision + IMU, poses 1..W and depths perturbed; frame 0 held by a
    synthetic strong prior on pose0 (the reference relies on the marg prior
    for this role). Check near-exact recovery of all poses."""
    p, v, q, pts_w, tic, qic = make_scene()
    grid, inv_depth = project_to_grid(p, q, pts_w, tic, qic)
    pre, si = make_window_imu(p, v, q)
    imu_valid = jnp.ones((NFRAMES - 1,), bool)

    truth = make_state(p, v, q, tic, qic, inv_depth)
    rng = np.random.default_rng(4)
    pert_p = np.asarray(p).copy()
    pert_q = np.asarray(q).copy()
    pert_v = np.asarray(v).copy()
    for i in range(1, NFRAMES):
        pert_p[i] += rng.standard_normal(3) * 0.03
        dq = geom.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.01))
        pert_q[i] = np.asarray(geom.quat_mul(jnp.asarray(pert_q[i]), dq))
        pert_v[i] += rng.standard_normal(3) * 0.05
    bad_depth = inv_depth * jnp.asarray(rng.uniform(0.85, 1.2, F))
    state = make_state(pert_p, pert_v, pert_q, tic, qic, bad_depth)

    # Strong gauge prior on pose0+sb0 (fixes yaw/pos/velocity gauge).
    from lfvio_tpu.backend.state import pose_dim
    D = pose_dim(NFRAMES)
    Jp = jnp.zeros((D, D), jnp.float64).at[:15, :15].set(jnp.eye(15) * 1e4)
    prior = PriorFactor.from_state(Jp, jnp.zeros((D,), jnp.float64), truth)

    cfg = SolverConfig(max_iterations=10, estimate_td=False, estimate_extrinsic=False)
    out, c0, c1, hist = lm_solve(state, grid, pre, si, imu_valid, prior, G, cfg)
    assert float(c1) < 1e-4 * float(c0), (float(c0), float(c1), list(map(float, hist)))
    np.testing.assert_allclose(np.asarray(out.p), p, atol=2e-3)
    for i in range(NFRAMES):
        dq = geom.quat_box_minus(out.q[i], jnp.asarray(q[i]))
        assert np.abs(np.asarray(dq)).max() < 1e-3


@pytest.mark.slow
def test_marginalize_old_prior_consistency():
    """The marginal prior must reproduce the information of the eliminated
    factors: after marginalizing frame 0, the prior's H on the remaining
    blocks should equal the Schur complement of the full H of the collected
    factors."""
    p, v, q, pts_w, tic, qic = make_scene()
    grid, inv_depth = project_to_grid(p, q, pts_w, tic, qic)
    pre, si = make_window_imu(p, v, q)
    truth = make_state(p, v, q, tic, qic, inv_depth)
    cfg = SolverConfig(estimate_td=False, estimate_extrinsic=False)
    empty_prior = PriorFactor.empty(dtype=jnp.float64)
    imu_valid = jnp.ones((NFRAMES - 1,), bool)

    prior = marginalize_old(truth, grid, pre, si, imu_valid, empty_prior, G, cfg)
    J = np.asarray(prior.J)
    H_prior = J.T @ J
    assert np.isfinite(H_prior).all()
    # At the ground truth all residuals are ~0 => prior residual ~0.
    from lfvio_tpu.backend.factors import prior_residual
    shifted = truth  # state snapshot inside prior is already shifted
    r = prior_residual(
        WindowState(
            p=prior.x0_p, q=prior.x0_q, v=prior.x0_v, ba=prior.x0_ba,
            bg=prior.x0_bg, tic=prior.x0_tic, qic=prior.x0_qic,
            td=prior.x0_td, inv_depth=truth.inv_depth,
        ),
        prior,
    )
    assert np.abs(np.asarray(r)).max() < 1.0, np.abs(np.asarray(r)).max()  # whitened IMU discretization floor

    # Independent check: Schur complement computed densely in numpy.
    H_pp, H_pl, H_ll, b_p, b_l, _ = assemble_normal_equations(
        truth,
        FeatureGrid(grid.bearing, grid.velocity, grid.td_obs, grid.valid,
                    grid.anchor, grid.used & (grid.anchor == 0)),
        pre, si, jnp.zeros((NFRAMES - 1,), bool).at[0].set(True),
        empty_prior, G, cfg,
    )
    H_pp, H_pl, H_ll = map(np.asarray, (H_pp, H_pl, H_ll))
    keep = np.ones(H_pp.shape[0], bool)
    keep[:6] = False  # pose0
    from lfvio_tpu.backend.state import sb_off
    keep[sb_off(0) : sb_off(0) + 9] = False
    # Eliminate depths (all anchored at 0 here)
    Hd = H_pp - (H_pl / np.maximum(H_ll, 1e-12)) @ H_pl.T
    Hmm = Hd[~keep][:, ~keep]
    Hmr = Hd[~keep][:, keep]
    Hrr = Hd[keep][:, keep]
    S = Hrr - Hmr.T @ np.linalg.pinv(Hmm, rcond=1e-10) @ Hmr
    # Prior H restricted to kept blocks, UNSHIFTED: undo the slide for compare
    # by mapping new slot k -> old slot k+1.
    from lfvio_tpu.backend.state import pose_off
    D = H_pp.shape[0]
    perm = np.zeros(D, int)
    for k in range(NFRAMES - 1):
        perm[pose_off(k + 1) : pose_off(k + 1) + 6] = np.arange(pose_off(k), pose_off(k) + 6)
        perm[sb_off(k + 1) : sb_off(k + 1) + 9] = np.arange(sb_off(k), sb_off(k) + 9)
    perm[15 * NFRAMES :] = np.arange(15 * NFRAMES, D)
    H_unshift = np.zeros_like(H_prior)
    idx = perm
    H_unshift[np.ix_(np.arange(D), np.arange(D))] = 0
    # new-layout index n corresponds to old index: build old H from prior
    Hp_old = np.zeros_like(H_prior)
    for a in range(D):
        for bcol in range(D):
            Hp_old[a, bcol] = 0.0
    # Simpler: compare in new layout by shifting S instead.
    S_full = np.zeros((D, D))
    S_full[np.ix_(keep, keep)] = S
    S_shift = np.zeros((D, D))
    new_from_old = np.full(D, -1, int)
    for k in range(NFRAMES - 1):
        new_from_old[pose_off(k) : pose_off(k) + 6] = np.arange(pose_off(k + 1), pose_off(k + 1) + 6)
        new_from_old[sb_off(k) : sb_off(k) + 9] = np.arange(sb_off(k + 1), sb_off(k + 1) + 9)
    new_from_old[15 * NFRAMES :] = np.arange(15 * NFRAMES, D)
    valid_new = new_from_old >= 0
    rows = np.where(valid_new)[0]
    S_shift[np.ix_(rows, rows)] = S_full[np.ix_(new_from_old[rows], new_from_old[rows])]
    scale = max(np.abs(S_shift).max(), 1.0)
    np.testing.assert_allclose(H_prior / scale, S_shift / scale, atol=5e-5)


def test_triangulate_grid_recovers_depths():
    from lfvio_tpu.backend.triangulate import triangulate_grid

    p, v, q, pts_w, tic, qic = make_scene()
    grid, inv_depth = project_to_grid(p, q, pts_w, tic, qic)
    state = make_state(p, v, q, tic, qic, jnp.ones(F))
    has_depth = jnp.zeros(F, bool)
    inv_est = triangulate_grid(state, grid, has_depth)
    np.testing.assert_allclose(np.asarray(inv_est), np.asarray(inv_depth), rtol=1e-6)
    # has_depth entries must be passed through untouched.
    keep = jnp.zeros(F, bool).at[::2].set(True)
    inv_mixed = triangulate_grid(state, grid, keep)
    np.testing.assert_allclose(np.asarray(inv_mixed[::2]), 1.0)
