"""Keyframe-axis (trajectory-segment) sharded BA vs ONE monolithic solve.

The 2-D (kf × f) mesh solve of SCALING.md §5: S segments each own W+1
keyframes (boundary keyframes shared between neighbors), their own
landmarks and IMU intervals; segments exchange boundary-keyframe
(state, sqrt-marginal) summaries between rounds. The segmented fixed point
must match the joint optimum of the SAME factor set solved as one long
window (possible since round 5's configurable window length)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from lfvio_tpu import geom
from lfvio_tpu.backend import (
    WindowState, FeatureGrid, PriorFactor, SolverConfig, lm_solve,
)
from lfvio_tpu.backend.state import pose_dim
from lfvio_tpu.backend.triangulate import triangulate_grid
from lfvio_tpu.imu import ImuNoise, preintegrate_parallel, whiten_covariance

from lfvio_tpu.dist.synthetic_traj import (
    G_NORM, FRAME_DT, N_SAMP,
    make_traj as _mk_traj, make_imu_buffers, seg_landmarks, bearings_for,
    anchor_prior, make_state, build_grid,
)

NOISE = ImuNoise(0.02, 0.01, 0.04, 0.001)


def make_traj(K, seed=0):
    return _mk_traj(K)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("S,n_f", [(2, 4), (4, 2)])
def test_segmented_matches_monolithic(S, n_f):
    from lfvio_tpu.dist import make_kf_mesh, segmented_trajectory_solve

    Wseg = 5
    Fseg = 8 * n_f // n_f * n_f  # divisible by n_f
    Fseg = 16
    K = S * Wseg + 1
    rng = np.random.default_rng(3)
    t, p, v, q = make_traj(K)
    dts, accs, gyrs, a0, g0 = make_imu_buffers(p, v, q)

    # Per-segment landmarks + exact-ish bearings (0.3 px noise so the
    # optimum is NOT the ground truth — the comparison is solver-vs-solver).
    noise = 0.3 / 160.0
    seg_pts = [seg_landmarks(p, s, Wseg, Fseg, seed=10) for s in range(S)]
    seg_bear = [
        bearings_for(seg_pts[s], p[s * Wseg : s * Wseg + Wseg + 1],
                     q[s * Wseg : s * Wseg + Wseg + 1], noise, rng)
        for s in range(S)
    ]

    # Perturbed initial state (shared between both solvers).
    p_init = p + rng.standard_normal(p.shape) * 0.04
    p_init[0] = p[0]
    v_init = v + rng.standard_normal(v.shape) * 0.02
    q_init = np.asarray(geom.quat_mul(
        jnp.asarray(q),
        geom.so3_exp(jnp.asarray(rng.standard_normal((K, 3)) * 0.005)),
    ))

    # Segmented solver: production-like per-round settings. Monolithic
    # REFERENCE: deeply converged (40 iterations, no cost-plateau exit) —
    # at 6 iterations from the 4 cm-perturbed init the long window is
    # still ~3.5 cm from its own optimum in the weakly-anchored yaw
    # directions, which would be misread as segmented-solver error.
    cfg = SolverConfig(
        max_iterations=6, estimate_td=False, estimate_extrinsic=False,
        cost_tol=0.0,
    )
    cfg_mono = SolverConfig(
        max_iterations=40, estimate_td=False, estimate_extrinsic=False,
        cost_tol=0.0,
    )
    dtype = jnp.float64

    # ---- monolithic: one long window with the union of all factors.
    D_mono = pose_dim(K, 1)
    bear_all = np.zeros((S * Fseg, K, 3))
    bear_all[..., 2] = 1.0
    valid_all = np.zeros((S * Fseg, K), bool)
    anchor_all = np.zeros((S * Fseg,), np.int32)
    for s in range(S):
        sl = slice(s * Fseg, (s + 1) * Fseg)
        fr = slice(s * Wseg, s * Wseg + Wseg + 1)
        bear_all[sl, fr] = seg_bear[s]
        valid_all[sl, fr] = True
        anchor_all[sl] = s * Wseg
    grid_mono = build_grid(bear_all, valid_all, anchor_all, dtype)
    # Anchors: strong on kf0 (gauge), weak on every other segment-start
    # keyframe (same weak gauge-holds the segmented solver uses in round 0)
    # — IDENTICAL factor sets in both solvers.
    anchors = {0: 300.0}
    for s in range(1, S):
        anchors[s * Wseg] = 0.3
    truth_state = make_state(p, v, q, np.ones(S * Fseg), dtype)
    prior_mono = anchor_prior(D_mono, K, anchors, truth_state, dtype)
    state_mono = make_state(p_init, v_init, q_init, np.ones(S * Fseg), dtype)

    pre = jax.vmap(
        lambda d, ac, gy, a_0, g_0, ba, bg: preintegrate_parallel(
            d, ac, gy, a_0, g_0, ba, bg, NOISE
        )
    )(jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
      jnp.asarray(a0), jnp.asarray(g0),
      state_mono.ba[:-1], state_mono.bg[:-1])
    sqrt_info, imu_ok = whiten_covariance(
        pre.covariance, jnp.ones((K - 1,), bool)
    )
    inv_d = triangulate_grid(state_mono, grid_mono,
                             jnp.zeros((S * Fseg,), bool))
    state_mono = dataclasses.replace(state_mono, inv_depth=inv_d)
    gravity = jnp.asarray([0.0, 0.0, G_NORM], dtype)
    mono_out, c0m, c1m, _ = lm_solve(
        state_mono, grid_mono, pre, sqrt_info, imu_ok, prior_mono,
        gravity, cfg_mono,
    )
    assert float(c1m) < float(c0m)

    # ---- segmented: batch the same data per segment.
    W1 = Wseg + 1
    D_seg = pose_dim(W1, 1)

    def seg(arr, s, extra=0):
        return arr[s * Wseg : s * Wseg + Wseg + 1 + extra]

    states = []
    grids = []
    priors = []
    for s in range(S):
        fr = slice(s * Wseg, s * Wseg + Wseg + 1)
        st = make_state(p_init[fr], v_init[fr], q_init[fr],
                        np.ones(Fseg), dtype)
        states.append(st)
        grids.append(build_grid(
            seg_bear[s], np.ones((Fseg, W1), bool),
            np.zeros((Fseg,), np.int32), dtype
        ))
        w0 = 300.0 if s == 0 else 0.3
        tr = make_state(p[fr], v[fr], q[fr], np.ones(Fseg), dtype)
        priors.append(anchor_prior(D_seg, W1, {0: w0}, tr, dtype))
    states_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *states
    )
    grids_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *grids)
    priors_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *priors)
    dts_b = jnp.asarray(dts.reshape(S, Wseg, -1))
    accs_b = jnp.asarray(accs.reshape(S, Wseg, -1, 3))
    gyrs_b = jnp.asarray(gyrs.reshape(S, Wseg, -1, 3))
    a0_b = jnp.asarray(a0.reshape(S, Wseg, 3))
    g0_b = jnp.asarray(g0.reshape(S, Wseg, 3))
    iv_b = jnp.ones((S, Wseg), bool)

    mesh = make_kf_mesh(S, n_f, jax.devices()[: S * n_f])
    # Consensus information travels ~1–2 segments per round (bidirectional
    # exchange); the far end of an S-segment chain needs O(S) rounds to
    # feel the gauge anchor. lax.scan keeps compile time independent of
    # the round count.
    out, gap, costs, _hist = segmented_trajectory_solve(
        mesh, states_b, grids_b, dts_b, accs_b, gyrs_b, a0_b, g0_b, iv_b,
        priors_b, NOISE, cfg, g_norm=G_NORM, n_outer=2 + 3 * S,
        boundary_weight=1.0,
    )
    out_p = np.asarray(out.p)     # [S, W1, 3]
    out_q = np.asarray(out.q)
    mono_p = np.asarray(mono_out.p)

    # Segment frames map to global keyframes s*Wseg + j.
    errs = []
    for s in range(S):
        for j in range(W1):
            errs.append(np.linalg.norm(out_p[s, j] - mono_p[s * Wseg + j]))
    errs = np.asarray(errs)
    # Boundary keyframe pairs must agree between neighboring segments.
    gaps = np.asarray(gap)
    assert np.isfinite(errs).all()
    assert gaps.max() < 5e-3, gaps
    # Segmented vs monolithic joint optimum: sub-centimeter agreement on a
    # multi-meter trajectory.
    assert errs.max() < 0.01, (errs.max(), errs.mean())
    # And both actually moved toward the (noisy-bearing) optimum from the
    # 4 cm-perturbed init.
    init_err = np.linalg.norm(p_init - p, axis=-1).max()
    final_vs_truth = max(
        np.linalg.norm(out_p[s, j] - p[s * Wseg + j])
        for s in range(S) for j in range(W1)
    )
    assert final_vs_truth < 0.5 * init_err
