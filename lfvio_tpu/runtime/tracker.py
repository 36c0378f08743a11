"""Front-end orchestration: per-frame feature tracking pipeline.

The device-side equivalent of the feature_tracker node
(/root/reference/feature_tracker/src/feature_tracker.cpp readImage pipeline +
feature_tracker_node.cpp publishing): CLAHE → pyramid → pyramidal LK →
border/RANSAC rejection → masked Shi-Tomasi refill → bearing lift + 3-D
bearing velocities. Id/track-count bookkeeping stays on the host (numpy);
all pixel work is jitted JAX on fixed-size slot arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import (
    clahe,
    gaussian_pyramid,
    pyramidal_lk,
    shi_tomasi_response,
    select_features,
    annulus_mask,
    spherical_ransac_e,
)


class FrontEnd:
    def __init__(
        self,
        camera,
        image_size,  # (H, W)
        max_cnt: int = 200,
        min_dist: int = 20,
        n_slots: int = 256,
        equalize: bool = True,
        annulus=None,  # (center_x, center_y, max_r, min_r) or None
        n_levels: int = 3,
        border: int = 1,
        dtype=jnp.float32,
        seed: int = 0,
    ):
        self.camera = camera
        self.H, self.W = image_size
        self.max_cnt = max_cnt
        self.min_dist = min_dist
        self.N = n_slots
        self.equalize = equalize
        self.n_levels = n_levels
        self.border = border
        self.dtype = dtype
        if annulus is not None:
            self.static_mask = annulus_mask(
                image_size, *[float(a) for a in annulus], dtype=dtype
            )
        else:
            self.static_mask = jnp.ones(image_size, bool)

        # Host slot state.
        self.pos = np.zeros((self.N, 2), np.float64)
        self.ids = np.full(self.N, -1, np.int64)
        self.track_cnt = np.zeros(self.N, np.int64)
        self.next_id = 0
        self.prev_pyr = None
        self.prev_time = None
        self.prev_bearing_by_id: dict = {}
        self.key = jax.random.PRNGKey(seed)

        self._preprocess = jax.jit(self._preprocess_impl)
        self._track = jax.jit(self._track_impl)
        # Detect always selects max_cnt candidates (static shape — a varying
        # n_new would recompile every frame); the host takes what it needs.
        self._detect = jax.jit(self._detect_impl)
        self._lift = jax.jit(self._lift_impl)
        self._ransac = jax.jit(self._ransac_impl)

    # ------------------------------------------------------------- device fns
    def _preprocess_impl(self, img):
        img = img.astype(self.dtype)
        if self.equalize:
            img = clahe(img)
        return tuple(gaussian_pyramid(img, self.n_levels))

    def _track_impl(self, pyr_prev, pyr_next, pts, valid):
        return pyramidal_lk(list(pyr_prev), list(pyr_next), pts, valid, self.n_levels)

    def _detect_impl(self, img, existing_pts, existing_valid):
        resp = shi_tomasi_response(img)
        return select_features(
            resp, self.static_mask, existing_pts, existing_valid,
            self.max_cnt, self.min_dist,
        )

    def _lift_impl(self, pts):
        rays = self.camera.lift_projective(pts)
        return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)

    def _ransac_impl(self, key, b1, b2, valid):
        return spherical_ransac_e(key, b1, b2, valid)

    # ----------------------------------------------------------------- frame
    def process(self, img: np.ndarray, t: float, publish: bool = True):
        """Run one frame. Returns dict id -> (bearing3, vel3, row) for
        features with track_cnt > 1 (the reference publishes only those,
        feature_tracker_node.cpp:113-179), or None when publish=False."""
        pyr = self._preprocess(jnp.asarray(img))
        valid = self.ids >= 0

        if self.prev_pyr is not None and valid.any():
            pts_next, status = self._track(
                self.prev_pyr, pyr,
                jnp.asarray(self.pos, self.dtype), jnp.asarray(valid),
            )
            pts_next = np.asarray(pts_next, np.float64)
            status = np.asarray(status) & valid
            # Border rejection (inBorder, feature_tracker_node BORDER_SIZE=1).
            b = self.border
            inb = (
                (pts_next[:, 0] >= b) & (pts_next[:, 0] < self.W - b)
                & (pts_next[:, 1] >= b) & (pts_next[:, 1] < self.H - b)
            )
            status &= inb
            # Static-mask containment (annulus).
            if True:
                ix = np.clip(pts_next[:, 0].astype(int), 0, self.W - 1)
                iy = np.clip(pts_next[:, 1].astype(int), 0, self.H - 1)
                status &= np.asarray(self.static_mask)[iy, ix]

            # Spherical RANSAC outlier rejection (rejectWithF) on the slots
            # that survived, using prev vs cur bearings.
            if publish and status.sum() >= 8:
                b_prev = np.asarray(
                    self._lift(jnp.asarray(self.pos, self.dtype))
                )
                b_cur = np.asarray(self._lift(jnp.asarray(pts_next, self.dtype)))
                self.key, sub = jax.random.split(self.key)
                _, inl = self._ransac(
                    sub,
                    jnp.asarray(b_prev, self.dtype),
                    jnp.asarray(b_cur, self.dtype),
                    jnp.asarray(status),
                )
                status &= np.asarray(inl)

            # Free failed slots.
            for s in np.where(valid & ~status)[0]:
                self.ids[s] = -1
                self.track_cnt[s] = 0
            self.pos[status] = pts_next[status]
            valid = self.ids >= 0

        self.track_cnt[valid] += 1

        feats = None
        if publish:
            # Refill with new detections on the masked response.
            n_alive = int(valid.sum())
            n_new = min(self.max_cnt - n_alive, self.N - n_alive)
            if n_new > 0:
                new_pts, new_ok = self._detect(
                    pyr[0],
                    jnp.asarray(self.pos, self.dtype),
                    jnp.asarray(valid),
                )
                new_pts = np.asarray(new_pts, np.float64)
                new_ok = np.asarray(new_ok)
                free = np.where(~valid)[0]
                k = 0
                for i in np.where(new_ok)[0][:n_new]:
                    if k >= len(free):
                        break
                    s = free[k]
                    k += 1
                    self.pos[s] = new_pts[i]
                    self.ids[s] = self.next_id
                    self.next_id += 1
                    self.track_cnt[s] = 1
                valid = self.ids >= 0

        # Bearings + velocities for all live tracks.
        bearings = np.asarray(self._lift(jnp.asarray(self.pos, self.dtype)))
        dt = (t - self.prev_time) if self.prev_time is not None else None
        cur_map = {}
        vel = np.zeros((self.N, 3))
        for s in np.where(valid)[0]:
            fid = int(self.ids[s])
            cur_map[fid] = bearings[s]
            if dt and fid in self.prev_bearing_by_id:
                vel[s] = (bearings[s] - self.prev_bearing_by_id[fid]) / dt

        feats = None
        if publish:
            feats = {
                int(self.ids[s]): (
                    bearings[s].copy(),
                    vel[s].copy(),
                    float(self.pos[s, 1]),  # row for rolling shutter
                )
                for s in np.where(valid & (self.track_cnt > 1))[0]
            }

        self.prev_pyr = pyr
        self.prev_time = t
        self.prev_bearing_by_id = cur_map
        return feats
