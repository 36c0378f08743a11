"""Synthetic VIO world: rendered camera frames + exact IMU + ground truth.

There is no public dataset vendored in this environment, so end-to-end
validation and benchmarking use a synthetic rig: a procedurally textured
cylindrical room viewed by any of our camera models along an analytic
trajectory, with IMU measurements derived by autodiff of the trajectory —
pixel-exact rendering, physically consistent inertial data, and perfect
ground truth.

Rendering is inverse-mapped on device: pixel → camera ray (the camera
model's lift) → world ray → closest cylinder/plane hit → smooth procedural
texture. The annulus of a PAL camera sees the full 360° of the room,
exercising the negative half-plane exactly like the real sensor.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import geom
from ..cam import ScaramuzzaCamera


def fit_inverse_poly(poly, max_rho=210.0, n_coeffs=20, n_samples=400):
    """Fit inv_poly(theta) -> rho for an OCAM forward polynomial, mirroring
    the reference calibration's inverse-poly refit
    (camera_model/src/camera_models/ScaramuzzaCamera.cc:224-601)."""
    rhos = np.linspace(1.0, max_rho, n_samples)
    z = np.polyval(poly[::-1], rhos)
    theta = np.arctan2(z, rhos)  # note: z here = -P_z (lift uses -z)
    ok = np.isfinite(theta)
    A = np.vander(theta[ok], n_coeffs, increasing=True)
    coef, *_ = np.linalg.lstsq(A, rhos[ok], rcond=None)
    return coef


# Annulus of the synthetic PAL rig (pixels): covers elevations from ~+40deg
# (inner radius, z>0) through the equator to ~-40deg (outer radius, z<0).
SYN_MIN_R = 64.0
SYN_MAX_R = 190.0


def make_synthetic_pal_camera(width=512, height=384, dtype=jnp.float64):
    """A small Scaramuzza PAL camera with a fitted inverse polynomial.

    The forward polynomial is the mindvision PAL calibration
    (config/mindvision/mindvision.yaml) radially rescaled by 0.4 to this
    image size, so the annulus genuinely spans the negative half-plane."""
    sc = 0.4
    base = np.array([-2.445239e2, 0.0, 1.748610e-3, -1.757770e-6, 4.475965e-9])
    poly = base / sc ** np.arange(5)
    inv_poly = fit_inverse_poly(poly)
    return ScaramuzzaCamera(
        poly=jnp.asarray(poly, dtype),
        inv_poly=jnp.asarray(inv_poly, dtype),
        C=jnp.asarray(1.0, dtype),
        D=jnp.asarray(0.0, dtype),
        E=jnp.asarray(0.0, dtype),
        cx=jnp.asarray(width / 2.0, dtype),
        cy=jnp.asarray(height / 2.0, dtype),
    )


@dataclasses.dataclass
class SyntheticWorld:
    camera: object
    width: int = 512
    height: int = 384
    room_radius: float = 6.0
    room_half_height: float = 3.0
    g_norm: float = 9.81
    seed: int = 0
    # trajectory scale knobs
    traj_amp: float = 0.8
    traj_freq: float = 0.25

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        n_waves = 24
        self._freqs = jnp.asarray(rng.uniform(0.8, 6.0, (n_waves, 3)))
        self._phases = jnp.asarray(rng.uniform(0, 2 * np.pi, n_waves))
        self._amps = jnp.asarray(rng.uniform(0.5, 1.0, n_waves) / np.arange(1, n_waves + 1) ** 0.25)
        self._render = jax.jit(self._render_impl)

    # ------------------------------------------------------------- trajectory
    def pose(self, t):
        """Analytic ground truth: position, orientation quaternion (wxyz)."""
        t = jnp.asarray(t, jnp.float64)
        A, w = self.traj_amp, self.traj_freq * 2 * jnp.pi

        def p_of_t(tt):
            return jnp.stack(
                [
                    A * jnp.sin(w * tt),
                    A * 0.8 * jnp.sin(0.7 * w * tt + 0.5),
                    0.3 * jnp.sin(1.3 * w * tt),
                ]
            )

        def theta_of_t(tt):
            return jnp.stack(
                [
                    0.12 * jnp.sin(0.9 * w * tt),
                    0.12 * jnp.sin(0.6 * w * tt + 1.0),
                    0.8 * jnp.sin(0.33 * w * tt),  # slow yaw sweep
                ]
            )

        p = p_of_t(t)
        q = geom.so3_exp(theta_of_t(t))
        return np.asarray(p), np.asarray(q)

    def imu_sample(self, t):
        """Exact accelerometer & gyroscope at time t (autodiff of the pose)."""
        t = jnp.asarray(t, jnp.float64)
        A, w = self.traj_amp, self.traj_freq * 2 * jnp.pi

        def p_of_t(tt):
            return jnp.stack(
                [
                    A * jnp.sin(w * tt),
                    A * 0.8 * jnp.sin(0.7 * w * tt + 0.5),
                    0.3 * jnp.sin(1.3 * w * tt),
                ]
            )

        def theta_of_t(tt):
            return jnp.stack(
                [
                    0.12 * jnp.sin(0.9 * w * tt),
                    0.12 * jnp.sin(0.6 * w * tt + 1.0),
                    0.8 * jnp.sin(0.33 * w * tt),
                ]
            )

        def q_of_t(tt):
            return geom.so3_exp(theta_of_t(tt))

        v_fn = jax.jacfwd(p_of_t)
        a_fn = jax.jacfwd(v_fn)
        a_w = a_fn(t)
        q = q_of_t(t)
        R = geom.quat_to_mat(q)
        gvec = jnp.asarray([0.0, 0.0, self.g_norm])
        acc_body = R.T @ (a_w + gvec)
        # omega_body = 2 * (q^-1 ⊗ q̇)_vec
        qdot = jax.jacfwd(q_of_t)(t)
        om = 2.0 * geom.quat_mul(geom.quat_conj(q), qdot)[1:4]
        return np.asarray(acc_body), np.asarray(om)

    def velocity(self, t):
        t = jnp.asarray(t, jnp.float64)
        A, w = self.traj_amp, self.traj_freq * 2 * jnp.pi

        def p_of_t(tt):
            return jnp.stack(
                [
                    A * jnp.sin(w * tt),
                    A * 0.8 * jnp.sin(0.7 * w * tt + 0.5),
                    0.3 * jnp.sin(1.3 * w * tt),
                ]
            )

        return np.asarray(jax.jacfwd(p_of_t)(t))

    # --------------------------------------------------------------- texture
    def _texture(self, X):
        phase = jnp.einsum("kc,...c->...k", self._freqs, X) + self._phases
        vals = jnp.einsum("k,...k->...", self._amps, jnp.sin(phase))
        return 128.0 + 100.0 * jnp.tanh(0.3 * vals)

    # --------------------------------------------------------------- render
    def _render_impl(self, R_wc, t_wc):
        H, W = self.height, self.width
        yy, xx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float64), jnp.arange(W, dtype=jnp.float64),
            indexing="ij",
        )
        pix = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
        rays = self.camera.lift_projective(pix)
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        d = rays @ R_wc.T  # world directions
        o = t_wc

        # Cylinder x^2 + y^2 = R^2 intersection.
        Rc = self.room_radius
        a = d[:, 0] ** 2 + d[:, 1] ** 2
        b = 2 * (o[0] * d[:, 0] + o[1] * d[:, 1])
        c = o[0] ** 2 + o[1] ** 2 - Rc * Rc
        disc = jnp.maximum(b * b - 4 * a * c, 0.0)
        s_cyl = (-b + jnp.sqrt(disc)) / jnp.maximum(2 * a, 1e-12)
        s_cyl = jnp.where((a > 1e-12) & (s_cyl > 0), s_cyl, 1e9)
        # Ceiling / floor planes z = ±h.
        h = self.room_half_height
        s_top = jnp.where(d[:, 2] > 1e-9, (h - o[2]) / d[:, 2], 1e9)
        s_bot = jnp.where(d[:, 2] < -1e-9, (-h - o[2]) / d[:, 2], 1e9)
        s = jnp.minimum(jnp.minimum(s_cyl, s_top), s_bot)
        X = o[None, :] + s[:, None] * d
        img = self._texture(X).reshape(H, W)
        return jnp.clip(img, 0.0, 255.0)

    def render(self, t):
        p, q = self.pose(t)
        R = np.asarray(geom.quat_to_mat(jnp.asarray(q)))
        return np.asarray(self._render(jnp.asarray(R), jnp.asarray(p)))

    # ----------------------------------------------------------- full dataset
    def generate(self, duration, frame_rate=15.0, imu_rate=200.0):
        """Yields a measurement stream: ('imu', t, acc, gyr) and
        ('frame', t, image) tuples in time order, plus ground truth arrays."""
        stream = []
        n_imu = int(duration * imu_rate) + 1
        for k in range(n_imu):
            t = k / imu_rate
            acc, om = self.imu_sample(t)
            stream.append(("imu", t, acc, om))
        n_frames = int(duration * frame_rate)
        for k in range(n_frames):
            t = k / frame_rate + 1e-4  # frames slightly after an IMU tick
            stream.append(("frame", t, None))
        stream.sort(key=lambda e: e[1])
        return stream
