import jax.numpy as jnp
import numpy as np

from lfvio_tpu import geom
from lfvio_tpu.vinit import (
    pnp_bearing_gn,
    solve_relative_rt,
    global_sfm,
    visual_imu_alignment,
    ExtrinsicRotationCalibrator,
)
from lfvio_tpu.vinit.alignment import AlignFrame
from lfvio_tpu.imu import ImuNoise, preintegrate


def rot(axis_angle):
    return np.asarray(geom.quat_to_mat(geom.so3_exp(jnp.asarray(axis_angle))))


def test_pnp_bearing_gn_full_sphere():
    rng = np.random.default_rng(0)
    R_true = rot([0.2, -0.3, 0.4])
    t_true = np.array([0.5, -0.2, 0.3])
    pts = rng.standard_normal((60, 3)) * 5.0
    pc = pts @ R_true.T + t_true
    b = pc / np.linalg.norm(pc, axis=-1, keepdims=True)  # incl. negative z
    assert (b[:, 2] < 0).any() and (b[:, 2] > 0).any()

    R0 = rot([0.25, -0.25, 0.35])  # perturbed init
    t0 = t_true + [0.1, -0.05, 0.08]
    R, t, ok = pnp_bearing_gn(pts, b, R0, t0)
    assert ok
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)


def test_solve_relative_rt():
    rng = np.random.default_rng(1)
    R = rot([0.05, -0.08, 0.1])  # cam1 -> cam2 map: X2 = R X1 + t
    t = np.array([0.4, 0.1, -0.2])
    pts = rng.standard_normal((80, 3)) * 4.0 + [0, 0, 3.0]
    pts[::4, 2] = -pts[::4, 2]  # some behind
    b1 = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    p2 = pts @ R.T + t
    b2 = p2 / np.linalg.norm(p2, axis=-1, keepdims=True)
    # 20% outliers
    out = rng.choice(80, 16, replace=False)
    b2_n = b2.copy()
    fake = rng.standard_normal((16, 3))
    b2_n[out] = fake / np.linalg.norm(fake, axis=-1, keepdims=True)

    R_out, T_out, ok = solve_relative_rt(b1, b2_n, rng=np.random.default_rng(7))
    assert ok
    # Convention: R_out = R^T (frame2-in-frame1 rotation), T_out ∝ -R^T t.
    np.testing.assert_allclose(R_out, R.T, atol=1e-4)
    t_dir = -R.T @ t
    t_dir = t_dir / np.linalg.norm(t_dir)
    got = T_out / np.linalg.norm(T_out)
    assert min(np.linalg.norm(got - t_dir), np.linalg.norm(got + t_dir)) < 1e-3


def make_window(seed=2, n_frames=11, n_feat=80):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n_frames)
    p = np.stack([t, 0.3 * np.sin(2 * t), 0.15 * t], -1)
    theta = np.stack([0.1 * np.sin(2 * t), 0.12 * t, 0.2 * np.sin(t)], -1)
    Rw = np.stack([rot(th) for th in theta])  # world-from-cam
    dirs = rng.standard_normal((n_feat, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = p.mean(0) + dirs * rng.uniform(3, 8, (n_feat, 1))
    obs = {}
    for fid in range(n_feat):
        lst = []
        for fr in range(n_frames):
            pc = Rw[fr].T @ (pts[fid] - p[fr])
            lst.append((fr, pc / np.linalg.norm(pc)))
        obs[fid] = lst
    return p, Rw, pts, obs


def test_global_sfm_reconstructs_window():
    n = 11
    p, Rw, pts, obs = make_window()
    l = 0
    # relative pose of newest (frame n-1) in frame l's camera coordinates:
    R_rel = Rw[l].T @ Rw[n - 1]
    t_rel = Rw[l].T @ (p[n - 1] - p[l])
    scale = np.linalg.norm(t_rel)
    ok, q_out, T_out, points = global_sfm(n, l, R_rel, t_rel / scale, obs)
    assert ok
    # Ground truth in frame-l coordinates, scaled by 1/scale.
    for i in range(n):
        R_gt = Rw[l].T @ Rw[i]
        T_gt = Rw[l].T @ (p[i] - p[l]) / scale
        R_got = np.asarray(geom.quat_to_mat(jnp.asarray(q_out[i])))
        np.testing.assert_allclose(R_got, R_gt, atol=2e-3)
        np.testing.assert_allclose(T_out[i], T_gt, atol=5e-3)


def test_visual_imu_alignment_recovers_scale_and_gravity():
    """Build frames from a trajectory with known scale/gravity and verify the
    linear alignment recovers them."""
    G = np.array([0.0, 0.0, 9.81])
    NOISE = ImuNoise(0.02, 0.01, 0.04, 0.001)
    n_frames, frame_dt, rate = 11, 0.1, 200
    rng = np.random.default_rng(3)
    s_true = 2.7  # metric scale of the visual frame

    # Discrete-consistent trajectory: piecewise-constant world accel & body rate.
    p = [np.zeros(3)]
    v = [np.array([0.5, 0.0, 0.1])]
    q = [np.asarray(geom.so3_exp(jnp.asarray([0.05, -0.02, 0.1])))]
    accs_w, omegas = [], []
    for k in range(n_frames - 1):
        accs_w.append(rng.standard_normal(3) * 0.8)
        omegas.append(rng.standard_normal(3) * 0.3)
    frames = []
    pre_list = [None]
    for k in range(n_frames - 1):
        a_w, om = accs_w[k], omegas[k]
        n_samp = int(rate * frame_dt)
        dts = np.full(n_samp, frame_dt / n_samp)
        acc_s, gyr_s = [], []
        qk = q[-1]
        for j in range(n_samp + 1):
            s = j / n_samp
            qj = geom.quat_mul(jnp.asarray(q[-1]), geom.so3_exp(jnp.asarray(om * s * frame_dt)))
            Rj = np.asarray(geom.quat_to_mat(qj))
            acc_s.append(Rj.T @ (a_w + G))
            gyr_s.append(om)
        pre = preintegrate(
            jnp.asarray(dts), jnp.asarray(np.asarray(acc_s)[1:]),
            jnp.asarray(np.asarray(gyr_s)[1:]),
            jnp.asarray(acc_s[0]), jnp.asarray(gyr_s[0]),
            jnp.zeros(3), jnp.zeros(3), NOISE,
        )
        pre_list.append(pre)
        p.append(p[-1] + v[-1] * frame_dt + 0.5 * a_w * frame_dt**2)
        v.append(v[-1] + a_w * frame_dt)
        q.append(np.asarray(geom.quat_mul(jnp.asarray(q[-1]), geom.so3_exp(jnp.asarray(om * frame_dt)))))

    frames = []
    for k in range(n_frames):
        fr = AlignFrame(
            R=np.asarray(geom.quat_to_mat(jnp.asarray(q[k]))),
            T=np.asarray(p[k]) / s_true,
        )
        if pre_list[k] is not None:
            pre = pre_list[k]
            fr.sum_dt = float(pre.sum_dt)
            fr.delta_p = np.asarray(pre.delta_p)
            fr.delta_q = np.asarray(pre.delta_q)
            fr.delta_v = np.asarray(pre.delta_v)
            fr.jac_q_bg = np.asarray(pre.jacobian[3:6, 12:15])
        frames.append(fr)

    ok, dbg, g_est, x = visual_imu_alignment(
        frames, np.zeros(3), 9.81, repropagate_fn=lambda f, b: None
    )
    assert ok
    assert np.linalg.norm(dbg) < 1e-3  # no true gyro bias
    np.testing.assert_allclose(g_est, G, atol=0.05)
    s_est = x[-1]
    np.testing.assert_allclose(s_est, s_true, rtol=5e-3)
    # velocities: x[3k:3k+3] are body-frame velocities v_k (R_k v_bk = v_wk)
    for k in range(n_frames):
        v_w = frames[k].R @ x[3 * k : 3 * k + 3]
        np.testing.assert_allclose(v_w, v[k], atol=0.05)


def test_ex_rotation_calibration():
    rng = np.random.default_rng(4)
    ric_true = rot([0.3, -0.5, 0.2])  # imu <- cam
    calib = ExtrinsicRotationCalibrator()
    done = False
    for k in range(12):
        w = rng.standard_normal(3) * 0.2
        R_imu = rot(w)
        R_cam = ric_true.T @ R_imu @ ric_true
        q_imu = np.asarray(geom.mat_to_quat(jnp.asarray(R_imu)))
        done, ric = calib.add_rotation_pair(R_cam, q_imu)
    assert done
    np.testing.assert_allclose(ric, ric_true, atol=1e-6)
