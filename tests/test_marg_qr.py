"""Parity tests for the f32-safe device paths introduced in round 2:

  * QR square-root marginalization vs the eigh/Schur reference formulation
    (must agree in the information sense: JᵀJ and Jᵀr identical in f64).
  * Device covariance whitening vs host f64 LLT whitening.
  * Device yaw-gauge fix vs the round-1 host implementation semantics.
"""

import pytest
import sys
import os

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfvio_tpu.runtime.profiling import make_window_problem
from lfvio_tpu.backend import SolverConfig, PriorFactor
from lfvio_tpu.backend.marginalize import (
    marginalize_old,
    marginalize_old_qr,
    marginalize_second_new,
    marginalize_second_new_qr,
)
from lfvio_tpu.backend.gauge import yaw_gauge_fix
from lfvio_tpu.backend.state import NFRAMES, pose_dim
from lfvio_tpu.imu import whiten_covariance
from lfvio_tpu.geom import host as hg

CFG = SolverConfig(max_iterations=4, estimate_td=False, estimate_extrinsic=False)


def _problem(dtype=jnp.float64, n_feat=64):
    """(state, grid, pre, sqrt_info, imu_valid, prior, gravity) at test
    scale, from the shared production-problem builder."""
    from lfvio_tpu.imu import preintegrate_parallel, whiten_covariance

    pb = make_window_problem(n_feat, dtype, imu_samples=16)
    noise = pb["noise"]
    pre = jax.vmap(
        lambda d, ac, gy, a0, g0, ba, bg: preintegrate_parallel(
            d, ac, gy, a0, g0, ba, bg, noise
        )
    )(
        jnp.asarray(pb["dts"], dtype), jnp.asarray(pb["accs"], dtype),
        jnp.asarray(pb["gyrs"], dtype), jnp.asarray(pb["a0"], dtype),
        jnp.asarray(pb["g0"], dtype),
        pb["state"].ba[:-1], pb["state"].bg[:-1],
    )
    si, iv = whiten_covariance(pre.covariance, jnp.asarray(pb["imu_valid"]))
    return (pb["state"], pb["grid"], pre, si, iv, pb["prior"], pb["gravity"])


@pytest.mark.slow
def test_marginalize_old_qr_matches_eigh_information():
    state, grid, pre, si, imu_valid, prior, G = _problem()
    # Anchor a few features at frame 0 so the depth-elimination path is live.
    p_eig = marginalize_old(state, grid, pre, si, imu_valid, prior, G, CFG)
    p_qr = marginalize_old_qr(state, grid, pre, si, imu_valid, prior, G, CFG)

    H_eig = np.asarray(p_eig.J.T @ p_eig.J)
    H_qr = np.asarray(p_qr.J.T @ p_qr.J)
    b_eig = np.asarray(p_eig.J.T @ p_eig.r0)
    b_qr = np.asarray(p_qr.J.T @ p_qr.r0)
    scale = max(np.abs(H_eig).max(), 1.0)
    assert np.allclose(H_eig, H_qr, atol=2e-6 * scale), (
        np.abs(H_eig - H_qr).max() / scale
    )
    bscale = max(np.abs(b_eig).max(), 1.0)
    assert np.allclose(b_eig, b_qr, atol=2e-6 * bscale)
    assert bool(p_qr.valid)
    # Same linearization snapshot.
    assert np.allclose(np.asarray(p_eig.x0_p), np.asarray(p_qr.x0_p))


@pytest.mark.slow
def test_marginalize_second_new_qr_matches_eigh_information():
    state, grid, pre, si, imu_valid, prior, G = _problem()
    p_eig = marginalize_second_new(state, prior, CFG)
    p_qr = marginalize_second_new_qr(state, prior, CFG)
    H_eig = np.asarray(p_eig.J.T @ p_eig.J)
    H_qr = np.asarray(p_qr.J.T @ p_qr.J)
    scale = max(np.abs(H_eig).max(), 1.0)
    assert np.allclose(H_eig, H_qr, atol=2e-6 * scale)
    b_eig = np.asarray(p_eig.J.T @ p_eig.r0)
    b_qr = np.asarray(p_qr.J.T @ p_qr.r0)
    bscale = max(np.abs(b_eig).max(), 1.0)
    assert np.allclose(b_eig, b_qr, atol=2e-6 * bscale)


def test_marginalize_second_new_qr_invalid_prior():
    state, grid, pre, si, imu_valid, prior, G = _problem()
    empty = PriorFactor.empty(jnp.float64)
    p_qr = marginalize_second_new_qr(state, empty, CFG)
    assert not bool(p_qr.valid)
    assert np.allclose(np.asarray(p_qr.J), 0.0)


def test_whiten_covariance_matches_host_f64():
    state, grid, pre, si, imu_valid, prior, G = _problem()
    cov = np.asarray(pre.covariance, np.float64)  # [W, 15, 15]
    S, ok = whiten_covariance(jnp.asarray(cov), jnp.asarray(imu_valid))
    S = np.asarray(S)
    assert bool(np.asarray(ok).all())
    for k in range(cov.shape[0]):
        # SᵀS must equal cov⁻¹ (any square root is a valid whitener).
        lhs = S[k].T @ S[k]
        rhs = np.linalg.inv(cov[k])
        scale = np.abs(rhs).max()
        assert np.allclose(lhs, rhs, atol=1e-4 * scale), (
            k, np.abs(lhs - rhs).max() / scale
        )


def test_whiten_covariance_f32_usable():
    state, grid, pre, si, imu_valid, prior, G = _problem()
    cov64 = np.asarray(pre.covariance, np.float64)
    S32, ok = whiten_covariance(
        jnp.asarray(cov64, jnp.float32), jnp.asarray(imu_valid)
    )
    assert bool(np.asarray(ok).all())
    S32 = np.asarray(S32, np.float64)
    for k in range(cov64.shape[0]):
        # f32 whitening must reproduce the Mahalanobis metric to f32 accuracy:
        # for random residuals r, |r S.T S r - r cov^-1 r| small relative.
        rng = np.random.default_rng(k)
        r = rng.standard_normal(15) * np.sqrt(np.diag(cov64[k]))
        m_ref = r @ np.linalg.inv(cov64[k]) @ r
        m_f32 = r @ (S32[k].T @ S32[k]) @ r
        assert abs(m_f32 - m_ref) < 2e-2 * abs(m_ref) + 1e-3


def test_yaw_gauge_fix_restores_frame0():
    state, grid, pre, si, imu_valid, prior, G = _problem()
    # Perturb the window by a global yaw + translation (gauge motion).
    yaw = 17.0
    Rg = hg.ypr_deg_to_R(np.array([yaw, 0.0, 0.0]))
    tg = np.array([0.3, -0.2, 0.15])
    p = np.asarray(state.p)
    q = np.asarray(state.q)
    v = np.asarray(state.v)
    p2 = (Rg @ p.T).T + tg
    q2 = np.stack([hg.mat_to_quat(Rg @ hg.quat_to_mat(qi)) for qi in q])
    v2 = (Rg @ v.T).T
    import dataclasses

    moved = dataclasses.replace(
        state, p=jnp.asarray(p2), q=jnp.asarray(q2), v=jnp.asarray(v2)
    )
    fixed = yaw_gauge_fix(moved, jnp.asarray(p[0]), jnp.asarray(q[0]))
    # Frame 0 position restored exactly; yaw of frame 0 restored.
    assert np.allclose(np.asarray(fixed.p[0]), p[0], atol=1e-9)
    ypr_fixed = hg.R_to_ypr_deg(hg.quat_to_mat(np.asarray(fixed.q[0])))
    ypr_orig = hg.R_to_ypr_deg(hg.quat_to_mat(q[0]))
    assert abs(ypr_fixed[0] - ypr_orig[0]) < 1e-6
    # Relative geometry unchanged: all relative poses match the original
    # gauge-moved window (the fix is a rigid yaw+translation).
    rel_before = np.asarray(moved.p[3] - moved.p[1])
    rel_after = np.asarray(fixed.p[3] - fixed.p[1])
    assert np.isclose(np.linalg.norm(rel_before), np.linalg.norm(rel_after))
