"""Multi-camera (dual-PAL up+down) capability tests.

The BASELINE dual-PAL configs (ID06/ID10) run two annular cameras on one
IMU; the reference carries a camera id per feature observation
(estimator_node.cpp:292-312). Here: per-observation camera ids in
FeatureGrid/SolverConfig(n_cams=2), per-camera extrinsics in WindowState
([C,3]/[C,4]), and landmarks freely observed from EITHER camera — including
single tracks whose observations alternate cameras (the negative-plane
sharing case: a landmark crossing from the up-PAL's annulus into the
down-PAL's)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfvio_tpu.geom import host as hg
from lfvio_tpu.backend import WindowState, FeatureGrid, PriorFactor, SolverConfig, lm_solve
from lfvio_tpu.backend.factors import projection_residuals_grid
from lfvio_tpu.backend.state import NFRAMES
from lfvio_tpu.runtime.synthetic import SyntheticWorld, make_synthetic_pal_camera
from lfvio_tpu.runtime.estimator import Estimator, EstimatorConfig
from lfvio_tpu.runtime.pipeline import VioPipeline
from lfvio_tpu.runtime.evaluation import ate_rmse

from _bearing_harness import make_landmarks, cam_bearings


# Rig: up-PAL (cam 0, axis +z) and down-PAL (cam 1, axis -z, 180° about x).
TICS = np.array([[0.0, 0.0, 0.05], [0.0, 0.0, -0.05]])
RICS = np.stack([np.eye(3), np.diag([1.0, -1.0, -1.0])])
# PAL annulus: 40°–120° from the optical axis (README.md:66-77) →
# bearing-z (cosine from axis) within [cos 120°, cos 40°].
COS_MAX, COS_MIN = np.cos(np.radians(40.0)), np.cos(np.radians(120.0))


def _scene_points(rng):
    """Wall points seen by BOTH cameras + cam-exclusive rings."""
    wall = make_landmarks(n=40, seed=3)
    ang = rng.uniform(0, 2 * np.pi, 12)
    # θ≈50° from the up axis: inside cam0's annulus, outside cam1's.
    up_ring = np.stack(
        [4.0 * np.cos(ang), 4.0 * np.sin(ang), np.full(12, 3.4)], -1)
    down_ring = np.stack(
        [4.0 * np.cos(ang + 0.3), 4.0 * np.sin(ang + 0.3),
         np.full(12, -3.4)], -1)
    return np.concatenate([wall, up_ring, down_ring])


class DualPalFrontEnd:
    """Analytic dual-PAL tracker stub: projects shared world landmarks into
    whichever camera's annulus contains them; overlap-zone landmarks
    alternate cameras across frames so single tracks carry mixed-camera
    observations."""

    def __init__(self, world, pts_w, vel_eps=5e-4):
        self.world = world
        self.pts_w = np.asarray(pts_w, np.float64)
        self.vel_eps = vel_eps
        self.frame_idx = 0
        self.n_resets = 0
        self.mixed_tracks = 0  # observations published on camera 1

    def process_arrays(self, img, t, publish=True):
        if not publish:
            return None
        t = float(t)
        n = len(self.pts_w)
        b = np.stack([
            cam_bearings(self.world, t, self.pts_w, RICS[c], TICS[c])
            for c in range(2)
        ])  # [2, N, 3]
        b2 = np.stack([
            cam_bearings(self.world, t + self.vel_eps, self.pts_w,
                         RICS[c], TICS[c])
            for c in range(2)
        ])
        vel = (b2 - b) / self.vel_eps
        vis = (b[..., 2] >= COS_MIN) & (b[..., 2] <= COS_MAX)  # [2, N]
        # Camera choice: exclusive → that camera; overlap → alternate.
        alt = (self.frame_idx + np.arange(n)) % 2
        cam = np.where(
            vis[0] & ~vis[1], 0,
            np.where(vis[1] & ~vis[0], 1, alt),
        )
        pub = vis[0] | vis[1]
        self.frame_idx += 1
        self.mixed_tracks += int(np.sum(pub & (cam == 1)))
        sel = np.arange(n)
        bearings = b[cam, sel]
        vels = vel[cam, sel]
        return (sel, bearings, vels, np.zeros(n), pub, cam)

    def reset(self):
        self.n_resets += 1


def test_dualcam_projection_residual_zero_at_truth():
    """Observations rendered from two cameras' true extrinsics must give
    zero residual under the per-observation-camera factor."""
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1.0, NFRAMES)
    p = np.stack([t, 0.2 * np.sin(2 * t), 0.1 * t], -1)
    q = np.tile(np.array([1.0, 0, 0, 0]), (NFRAMES, 1))
    pts_w = rng.uniform(-4, 4, (32, 3)) + np.array([0, 0, 6.0])

    F = 32
    cam = (rng.integers(0, 2, (F, NFRAMES))).astype(np.int32)
    bearings = np.zeros((F, NFRAMES, 3))
    for j in range(NFRAMES):
        for f in range(F):
            c = cam[f, j]
            x_imu = pts_w[f] - p[j]
            x_cam = RICS[c].T @ (x_imu - TICS[c])
            bearings[f, j] = x_cam / np.linalg.norm(x_cam)
    anchor = np.zeros(F, np.int32)
    inv_depth = np.zeros(F)
    for f in range(F):
        c = cam[f, 0]
        x_cam = RICS[c].T @ ((pts_w[f] - p[0]) - TICS[c])
        inv_depth[f] = 1.0 / np.linalg.norm(x_cam)

    state = WindowState(
        p=jnp.asarray(p), q=jnp.asarray(q),
        v=jnp.zeros((NFRAMES, 3)), ba=jnp.zeros((NFRAMES, 3)),
        bg=jnp.zeros((NFRAMES, 3)),
        tic=jnp.asarray(TICS),
        qic=jnp.asarray(np.stack([hg.mat_to_quat(R) for R in RICS])),
        td=jnp.zeros(()), inv_depth=jnp.asarray(inv_depth),
    )
    grid = FeatureGrid(
        bearing=jnp.asarray(bearings),
        velocity=jnp.zeros((F, NFRAMES, 3)),
        td_obs=jnp.zeros((F, NFRAMES)),
        valid=jnp.ones((F, NFRAMES), bool),
        anchor=jnp.asarray(anchor),
        used=jnp.ones(F, bool),
        cam=jnp.asarray(cam),
    )
    res, valid = projection_residuals_grid(state, grid, 160.0 / 1.5)
    assert np.abs(np.asarray(res)).max() < 1e-6


@pytest.mark.slow
def test_dual_pal_e2e_shared_features():
    """Dual-PAL up+down rig on the bearing harness: initializes, tracks,
    and stays accurate with features shared across both cameras (mixed-
    camera tracks in one BA)."""
    cam = make_synthetic_pal_camera()
    world = SyntheticWorld(camera=cam, traj_freq=0.6)
    rng = np.random.default_rng(5)
    pts = _scene_points(rng)

    est = Estimator(EstimatorConfig(
        n_feature_slots=96, n_cams=2,
        tic=TICS, ric=RICS,
        solver_dtype=jnp.float64,
    ))
    fe = DualPalFrontEnd(world, pts)
    pipe = VioPipeline(fe, est)
    imu_rate, frame_rate, duration = 200.0, 20.0, 5.0
    n_imu = int(duration * imu_rate) + 1
    ts = np.arange(n_imu) / imu_rate
    acc, om = world.imu_batch(ts)
    per = int(round(imu_rate / frame_rate))
    for k in range(n_imu):
        if k % per == 0:
            pipe.feed_frame(float(ts[k]), ts[k])
        pipe.feed_imu(float(ts[k]), acc[k], om[k])
    pipe.flush()

    assert est.solver_flag == est.NON_LINEAR, "dual-PAL init failed"
    assert fe.mixed_tracks > 0
    # Cross-camera observations really entered the window.
    fm_cams = est.fm.cam[est.fm.valid]
    assert (fm_cams == 0).any() and (fm_cams == 1).any(), \
        "no cross-camera observations in the window"
    # Mixed-camera single tracks exist (a slot with obs from both cameras).
    live = est.fm.feature_id >= 0
    mixed = 0
    for s in np.where(live)[0]:
        cs = est.fm.cam[s][est.fm.valid[s]]
        if len(np.unique(cs)) > 1:
            mixed += 1
    assert mixed > 0, "no single track observed by both cameras"

    times = np.asarray(est.times)
    traj_p = np.asarray(est.traj_p)
    gt_p, _ = world.pose_batch(times)
    ate, _n = ate_rmse(times, traj_p, times, gt_p)
    assert ate < 0.15, f"dual-PAL ATE {ate:.3f} m"


def test_dual_pal_rendered_image_pipeline():
    """IMAGE-LEVEL dual-PAL runtime (round-5): two rendered PAL streams
    (up + down cameras), two full tracker device programs with a shared
    feature-id space (DualFrontEnd), per-camera annulus masks, and the
    n_cams=2 estimator — the runtime half of BASELINE configs ID06/ID10
    (the stub test above remains the fast estimator-level path)."""
    from lfvio_tpu.runtime.synthetic import SYN_MIN_R, SYN_MAX_R
    from lfvio_tpu.runtime.tracker import FrontEnd, DualFrontEnd

    cam = make_synthetic_pal_camera(dtype=jnp.float64)
    world = SyntheticWorld(camera=cam)
    H, W = world.height, world.width
    annulus = (W / 2, H / 2, SYN_MAX_R, SYN_MIN_R)
    fe0 = FrontEnd(cam, (H, W), max_cnt=90, min_dist=15, n_slots=128,
                   annulus=annulus, equalize=False, dtype=jnp.float32)
    fe1 = FrontEnd(cam, (H, W), max_cnt=90, min_dist=15, n_slots=128,
                   annulus=annulus, equalize=False, dtype=jnp.float32,
                   seed=1)
    fe = DualFrontEnd(fe0, fe1)
    est = Estimator(EstimatorConfig(
        n_feature_slots=256, n_cams=2, tic=TICS, ric=RICS,
        solver_dtype=jnp.float64,
    ))
    pipe = VioPipeline(fe, est)
    stream = world.generate(duration=6.0, frame_rate=15.0, imu_rate=200.0)

    def render_pair(t):
        up = world.render_rig(t, RICS[0], TICS[0])
        down = world.render_rig(t, RICS[1], TICS[1])
        return up, down

    times, traj_p, traj_q = pipe.run(stream, render_pair)

    assert est.solver_flag == est.NON_LINEAR, "rendered dual-PAL init failed"
    assert len(times) > 30, len(times)
    # Observations from BOTH cameras participate in the window.
    fm_cams = est.fm.cam[est.fm.valid]
    assert (fm_cams == 0).any() and (fm_cams == 1).any()
    gt_p, _ = world.pose_batch(np.asarray(times))
    ate, n = ate_rmse(np.asarray(times), np.asarray(traj_p),
                      np.asarray(times), gt_p)
    assert np.isfinite(ate) and n > 30
    assert ate < 0.25, f"rendered dual-PAL ATE {ate:.3f} m"
