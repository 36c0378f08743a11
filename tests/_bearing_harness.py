"""Bearing-level estimator harness: feeds ANALYTIC features (projected 3-D
landmarks) + exact IMU through the real VioPipeline, bypassing rendering and
the KLT tracker (a stub frontend serves perfect correspondences). This
isolates backend capabilities (td estimation, extrinsic calibration,
relocalization) and runs ~10x faster than the full image pipeline."""

from __future__ import annotations

import numpy as np

from lfvio_tpu.runtime.pipeline import VioPipeline
from lfvio_tpu.runtime.synthetic import (
    SyntheticWorld,
    _np_quat_to_mat,
    _np_so3_exp,
)


def make_landmarks(n=48, seed=3, radius=5.5, half_height=2.5):
    """Points on the synthetic room's cylinder wall + floor/ceiling rings."""
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-half_height, half_height, n)
    r = np.where(rng.random(n) < 0.8, radius, rng.uniform(2.0, radius, n))
    return np.stack([r * np.cos(ang), r * np.sin(ang), z], -1)


def cam_bearings(world: SyntheticWorld, t, pts_w, ric, tic):
    """Unit bearings of world points in the camera at TRUE capture time t."""
    p = world._p_of_t(t)
    R = _np_quat_to_mat(_np_so3_exp(world._theta_of_t(t)))
    x_imu = (pts_w - p) @ R  # R.T @ (pts - p) rowwise
    x_cam = (x_imu - tic) @ ric  # ric.T @ (x_imu - tic)
    return x_cam / np.linalg.norm(x_cam, axis=-1, keepdims=True)


class BearingFrontEnd:
    """Stub FrontEnd: 'tracks' by projecting known landmarks analytically.

    Frames are STAMPED at t but OBSERVED at t + td_true (the planted camera
    delay); bearing velocities are the exact d(bearing)/dt the real tracker
    would publish."""

    def __init__(self, world, pts_w, ric, tic, td_true=0.0, vel_eps=5e-4):
        self.world = world
        self.pts_w = np.asarray(pts_w, np.float64)
        self.ric = np.eye(3) if ric is None else np.asarray(ric, np.float64)
        self.tic = np.zeros(3) if tic is None else np.asarray(tic, np.float64)
        self.td_true = td_true
        self.vel_eps = vel_eps
        self.n_resets = 0

    def process_arrays(self, img, t, publish=True):
        if not publish:
            return None
        t = float(t)
        t_obs = t + self.td_true
        b = cam_bearings(self.world, t_obs, self.pts_w, self.ric, self.tic)
        b2 = cam_bearings(
            self.world, t_obs + self.vel_eps, self.pts_w, self.ric, self.tic
        )
        vel = (b2 - b) / self.vel_eps
        n = len(self.pts_w)
        return (
            np.arange(n), b, vel, np.zeros(n), np.ones(n, bool),
        )

    def reset(self):
        self.n_resets += 1


def run_bearing_stream(
    est,
    world: SyntheticWorld,
    pts_w,
    duration=4.0,
    frame_rate=20.0,
    imu_rate=200.0,
    td_true=0.0,
    ric=None,
    tic=None,
):
    """Drive the estimator through VioPipeline with analytic features & exact
    IMU. Uses the real measurement-alignment path (live-td pairing,
    boundary interpolation). Returns the pipeline."""
    fe = BearingFrontEnd(world, pts_w, ric, tic, td_true=td_true)
    pipe = VioPipeline(fe, est)
    imu_per_frame = int(round(imu_rate / frame_rate))
    n_imu = int(duration * imu_rate) + 1
    ts = np.arange(n_imu) / imu_rate
    acc, om = world.imu_batch(ts)
    for k in range(n_imu):
        if k % imu_per_frame == 0:
            pipe.feed_frame(float(ts[k]), ts[k])
        pipe.feed_imu(float(ts[k]), acc[k], om[k])
    pipe.flush()
    return pipe
