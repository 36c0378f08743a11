import jax
import jax.numpy as jnp
import numpy as np

from lfvio_tpu import geom
from lfvio_tpu.imu import (
    ImuNoise,
    preintegrate,
    preintegrate_parallel,
    bias_corrected_delta,
    imu_residual,
    propagate_state_midpoint,
)

G = np.array([0.0, 0.0, 9.81])
NOISE = ImuNoise(acc_n=0.02, gyr_n=0.01, acc_w=0.04, gyr_w=0.001)


def analytic_trajectory(t):
    """Smooth sinusoidal trajectory with rotation; returns p, v, a, R, omega_body."""
    p = np.stack(
        [np.sin(t), 0.5 * np.cos(2 * t), 0.3 * np.sin(0.7 * t)], axis=-1
    )
    v = np.stack(
        [np.cos(t), -np.sin(2 * t), 0.21 * np.cos(0.7 * t)], axis=-1
    )
    a = np.stack(
        [-np.sin(t), -2 * np.cos(2 * t), -0.147 * np.sin(0.7 * t)], axis=-1
    )
    # Rotation: exp of a smooth axis-angle curve; omega from finite difference
    theta = np.stack(
        [0.3 * np.sin(0.9 * t), 0.2 * np.cos(1.3 * t), 0.4 * np.sin(0.5 * t)],
        axis=-1,
    )
    q = np.asarray(geom.so3_exp(jnp.asarray(theta)))
    return p, v, a, q


def make_imu(t):
    """Exact accelerometer/gyro measurements along the analytic trajectory."""
    p, v, a, q = analytic_trajectory(t)
    R = np.asarray(geom.quat_to_mat(jnp.asarray(q)))
    acc = np.einsum("nji,nj->ni", R, a + G)  # body-frame specific force
    # omega_body from quaternion finite differences at high rate
    dt = t[1] - t[0]
    omega = np.zeros_like(p)
    for i in range(len(t)):
        i0, i1 = max(i - 1, 0), min(i + 1, len(t) - 1)
        dq = geom.quat_mul(
            geom.quat_conj(jnp.asarray(q[i0])), jnp.asarray(q[i1])
        )
        omega[i] = np.asarray(geom.so3_log(dq)) / (t[i1] - t[i0])
    return p, v, q, acc, omega


def test_preintegration_matches_true_relative_motion():
    dt = 0.005
    t = np.arange(0, 0.25 + dt / 2, dt)
    p, v, q, acc, gyr = make_imu(t)

    pre = preintegrate(
        jnp.full((len(t) - 1,), dt),
        jnp.asarray(acc[1:]),
        jnp.asarray(gyr[1:]),
        jnp.asarray(acc[0]),
        jnp.asarray(gyr[0]),
        jnp.zeros(3),
        jnp.zeros(3),
        NOISE,
    )
    res = imu_residual(
        pre,
        jnp.asarray(p[0]), jnp.asarray(q[0]), jnp.asarray(v[0]),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(p[-1]), jnp.asarray(q[-1]), jnp.asarray(v[-1]),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(G),
    )
    # Discretization error of midpoint integration at 200 Hz over 0.25 s.
    assert np.abs(np.asarray(res)).max() < 2e-4, np.asarray(res)
    np.testing.assert_allclose(float(pre.sum_dt), 0.25, atol=1e-9)


def test_padding_is_noop():
    dt = 0.005
    t = np.arange(0, 0.1 + dt / 2, dt)
    _, _, _, acc, gyr = make_imu(t)
    args = (jnp.asarray(acc[0]), jnp.asarray(gyr[0]), jnp.zeros(3), jnp.zeros(3), NOISE)

    pre_a = preintegrate(
        jnp.full((len(t) - 1,), dt), jnp.asarray(acc[1:]), jnp.asarray(gyr[1:]), *args
    )
    # Same samples plus 8 zero-dt padding entries.
    pad = 8
    dts = jnp.concatenate([jnp.full((len(t) - 1,), dt), jnp.zeros(pad)])
    accs = jnp.concatenate([jnp.asarray(acc[1:]), jnp.tile(acc[-1], (pad, 1))])
    gyrs = jnp.concatenate([jnp.asarray(gyr[1:]), jnp.tile(gyr[-1], (pad, 1))])
    pre_b = preintegrate(dts, accs, gyrs, *args)

    np.testing.assert_allclose(pre_a.delta_p, pre_b.delta_p, atol=1e-12)
    np.testing.assert_allclose(pre_a.delta_q, pre_b.delta_q, atol=1e-12)
    np.testing.assert_allclose(pre_a.covariance, pre_b.covariance, atol=1e-12)
    np.testing.assert_allclose(pre_a.jacobian, pre_b.jacobian, atol=1e-12)


def test_parallel_preintegration_matches_sequential():
    """The associative-scan formulation must reproduce the sequential
    lax.scan recursion (deltas, 15×15 Jacobian, covariance) including
    zero-dt padding and non-zero biases."""
    dt = 0.005
    t = np.arange(0, 0.25 + dt / 2, dt)
    _, _, _, acc, gyr = make_imu(t)
    pad = 7
    dts = jnp.concatenate([jnp.full((len(t) - 1,), dt), jnp.zeros(pad)])
    accs = jnp.concatenate([jnp.asarray(acc[1:]), jnp.tile(acc[-1], (pad, 1))])
    gyrs = jnp.concatenate([jnp.asarray(gyr[1:]), jnp.tile(gyr[-1], (pad, 1))])
    ba = jnp.asarray([3e-3, -2e-3, 1e-3])
    bg = jnp.asarray([-1e-3, 2e-3, -3e-3])
    args = (dts, accs, gyrs, jnp.asarray(acc[0]), jnp.asarray(gyr[0]), ba, bg, NOISE)

    pre_s = preintegrate(*args)
    pre_p = preintegrate_parallel(*args)
    # Tolerances: the sequential path evaluates R1 from the *unnormalized*
    # post-step quaternion (matching the reference's Eigen code, which calls
    # toRotationMatrix before delta_q.normalize()); the parallel path uses
    # normalized prefixes. The O(|ω·dt|²/8 ≈ 1e-6) relative difference is an
    # integration-detail ambiguity, orders below the IMU noise floor.
    np.testing.assert_allclose(pre_p.delta_p, pre_s.delta_p, atol=1e-8)
    np.testing.assert_allclose(pre_p.delta_v, pre_s.delta_v, atol=1e-8)
    np.testing.assert_allclose(
        geom.quat_box_minus(pre_p.delta_q, pre_s.delta_q), np.zeros(3), atol=1e-9
    )
    np.testing.assert_allclose(pre_p.jacobian, pre_s.jacobian, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(pre_p.covariance, pre_s.covariance, rtol=2e-5, atol=1e-12)
    np.testing.assert_allclose(float(pre_p.sum_dt), float(pre_s.sum_dt), atol=1e-12)


def test_bias_jacobian_matches_reintegration():
    """First-order bias correction should match re-preintegration with the
    perturbed bias (the reference's repropagate path)."""
    dt = 0.005
    t = np.arange(0, 0.25 + dt / 2, dt)
    _, _, _, acc, gyr = make_imu(t)
    base = (
        jnp.full((len(t) - 1,), dt),
        jnp.asarray(acc[1:]),
        jnp.asarray(gyr[1:]),
        jnp.asarray(acc[0]),
        jnp.asarray(gyr[0]),
    )
    ba0, bg0 = jnp.zeros(3), jnp.zeros(3)
    pre = preintegrate(*base, ba0, bg0, NOISE)

    dba = jnp.asarray([2e-3, -1e-3, 3e-3])
    dbg = jnp.asarray([-1e-3, 2e-3, 1e-3])
    pre_re = preintegrate(*base, ba0 + dba, bg0 + dbg, NOISE)

    dp_corr, dq_corr, dv_corr = bias_corrected_delta(pre, ba0 + dba, bg0 + dbg)
    np.testing.assert_allclose(dp_corr, pre_re.delta_p, atol=5e-7)
    np.testing.assert_allclose(dv_corr, pre_re.delta_v, atol=5e-6)
    np.testing.assert_allclose(
        geom.quat_box_minus(dq_corr, pre_re.delta_q), np.zeros(3), atol=1e-6
    )


def test_covariance_psd_and_monotone():
    dt = 0.005
    t = np.arange(0, 0.5 + dt / 2, dt)
    _, _, _, acc, gyr = make_imu(t)
    pre = preintegrate(
        jnp.full((len(t) - 1,), dt),
        jnp.asarray(acc[1:]),
        jnp.asarray(gyr[1:]),
        jnp.asarray(acc[0]),
        jnp.asarray(gyr[0]),
        jnp.zeros(3), jnp.zeros(3), NOISE,
    )
    cov = np.asarray(pre.covariance)
    np.testing.assert_allclose(cov, cov.T, atol=1e-15)
    eigs = np.linalg.eigvalsh(cov)
    assert eigs.min() > 0, eigs.min()


def test_propagate_state_midpoint_tracks_trajectory():
    dt = 0.005
    t = np.arange(0, 1.0 + dt / 2, dt)
    p, v, q, acc, gyr = make_imu(t)
    pj = jnp.asarray(p[0])
    qj = jnp.asarray(q[0])
    vj = jnp.asarray(v[0])
    for i in range(1, len(t)):
        pj, qj, vj = propagate_state_midpoint(
            pj, qj, vj,
            jnp.asarray(acc[i - 1]), jnp.asarray(gyr[i - 1]),
            jnp.asarray(acc[i]), jnp.asarray(gyr[i]),
            dt, jnp.zeros(3), jnp.zeros(3), jnp.asarray(G),
        )
    assert np.linalg.norm(np.asarray(pj) - p[-1]) < 2e-3
    assert np.linalg.norm(np.asarray(vj) - v[-1]) < 2e-3
