"""Host-side feature bookkeeping over the sliding window.

Replaces the reference's FeatureManager
(/root/reference/vins_estimator/src/feature_manager.{h,cpp}): per-id C++
lists become fixed-slot numpy arrays mirroring the device FeatureGrid. The
host owns id allocation, window sliding, parallax keyframe logic, and depth
re-anchoring; the device consumes the dense grid.

Conventions match the reference:
  * keyframe test: mean angular parallax acos(p_i·p_j)*10 over features seen
    in the last two frames >= MIN_PARALLAX, or track count < 20
    (addFeatureCheckParallax / compensatedParallax2).
  * depths are inverse *ray* depths at the anchor frame (valid for negative
    plane); re-anchoring on slide-old uses dep = |pts_j| (removeBackShiftDepth).
"""

from __future__ import annotations

import numpy as np

INIT_DEPTH = 5.0  # reference INIT_DEPTH (parameters.cpp)


class HostFeatureManager:
    def __init__(self, n_slots: int, n_frames: int):
        self.F = n_slots
        self.W1 = n_frames
        self.bearing = np.zeros((n_slots, n_frames, 3))
        self.velocity = np.zeros((n_slots, n_frames, 3))
        self.td_obs = np.zeros((n_slots, n_frames))
        self.valid = np.zeros((n_slots, n_frames), bool)
        self.anchor = np.zeros(n_slots, np.int32)
        self.feature_id = np.full(n_slots, -1, np.int64)
        self.depth = np.full(n_slots, -1.0)  # ray depth at anchor; <0 = unknown
        self.last_track_num = 0

    # ------------------------------------------------------------------ add
    def add_frame(self, frame_idx: int, feats: dict, min_parallax: float) -> bool:
        """Insert features for the frame at window slot frame_idx.

        feats: id -> (bearing3, velocity3, td_obs). Returns True if the
        *previous* frame should be treated as a keyframe (MARGIN_OLD).
        """
        id_to_slot = {fid: s for s, fid in enumerate(self.feature_id) if fid >= 0}
        self.last_track_num = 0
        for fid, (b, v, td) in feats.items():
            s = id_to_slot.get(fid)
            if s is None:
                s = self._alloc_slot()
                if s is None:
                    continue  # out of slots; drop (reference caps at NUM_OF_F)
                self.feature_id[s] = fid
                self.anchor[s] = frame_idx
                self.depth[s] = -1.0
            else:
                self.last_track_num += 1
            self.bearing[s, frame_idx] = b
            self.velocity[s, frame_idx] = v
            self.td_obs[s, frame_idx] = td
            self.valid[s, frame_idx] = True

        if frame_idx < 2 or self.last_track_num < 20:
            return True
        # Mean angular parallax between the two previous frames
        # (compensatedParallax2, feature_manager.cpp:353-369).
        m = (
            (self.feature_id >= 0)
            & self.valid[:, frame_idx - 2]
            & self.valid[:, frame_idx - 1]
            & (self.anchor <= frame_idx - 2)
        )
        if not m.any():
            return True
        pi = self.bearing[m, frame_idx - 2]
        pj = self.bearing[m, frame_idx - 1]
        dots = np.clip(np.sum(pi * pj, -1), -1.0, 1.0)
        parallax = np.arccos(dots) * 10.0
        return float(parallax.mean()) >= min_parallax

    def _alloc_slot(self):
        free = np.where(self.feature_id < 0)[0]
        return int(free[0]) if len(free) else None

    # ----------------------------------------------------------------- query
    def used_mask(self):
        """Features that participate in BA: >=2 observations and anchored
        before W-2 (getFeatureCount semantics, feature_manager.cpp:28-42)."""
        nobs = self.valid.sum(1)
        return (self.feature_id >= 0) & (nobs >= 2) & (self.anchor < self.W1 - 3)

    def corresponding(self, fi: int, fj: int):
        """Bearing pairs observed in both frames (getCorresponding)."""
        m = (self.feature_id >= 0) & self.valid[:, fi] & self.valid[:, fj]
        return self.bearing[m, fi], self.bearing[m, fj], self.feature_id[m]

    def observations_dict(self):
        """feature_id -> [(frame, bearing)] for SfM."""
        out = {}
        for s in range(self.F):
            if self.feature_id[s] < 0:
                continue
            obs = [
                (int(j), self.bearing[s, j].copy())
                for j in range(self.W1)
                if self.valid[s, j]
            ]
            if obs:
                out[int(self.feature_id[s])] = obs
        return out

    # ----------------------------------------------------------------- slide
    def slide_old(self, marg_R, marg_P, new_R, new_P):
        """MARGIN_OLD slide: drop frame 0, shift, re-anchor depths of
        features anchored there (removeBackShiftDepth semantics with
        dep_j = |pts_j|, feature_manager.cpp:271-310).

        marg_R/marg_P: camera pose of the dropped frame; new_R/new_P: camera
        pose of the new frame 0.
        """
        anchored0 = (self.feature_id >= 0) & (self.anchor == 0)
        for s in np.where(anchored0)[0]:
            if not self.valid[s, 0]:
                self.anchor[s] = 0  # defensive; shouldn't happen
                continue
            uv = self.bearing[s, 0]
            dep = self.depth[s]
            n_remaining = self.valid[s, 1:].sum()
            if n_remaining < 2:
                self._free(s)
                continue
            if dep > 0:
                pts = uv * dep
                w_pts = marg_R @ pts + marg_P
                pts_j = new_R.T @ (w_pts - new_P)
                dj = np.linalg.norm(pts_j)
                self.depth[s] = dj if dj > 0 else INIT_DEPTH
            # anchor moves to the first remaining observation
        # Shift all windows left by one.
        self.bearing[:, :-1] = self.bearing[:, 1:]
        self.velocity[:, :-1] = self.velocity[:, 1:]
        self.td_obs[:, :-1] = self.td_obs[:, 1:]
        self.valid[:, :-1] = self.valid[:, 1:]
        self.valid[:, -1] = False
        self.bearing[:, -1] = 0.0
        live = self.feature_id >= 0
        self.anchor[live] = np.maximum(self.anchor[live] - 1, 0)
        # Features anchored at a now-invalid first obs: move anchor forward.
        for s in np.where(live)[0]:
            if not self.valid[s].any():
                self._free(s)
                continue
            first = int(np.argmax(self.valid[s]))
            if first != self.anchor[s]:
                self.anchor[s] = first
                self.depth[s] = -1.0  # re-triangulate at the new anchor

    def slide_second_new(self, frame_count: int):
        """MARGIN_SECOND_NEW: remove the observation at frame_count-1 and
        pull the newest frame's observation into its place (removeFront)."""
        j = frame_count - 1
        live = self.feature_id >= 0
        # Newest column moves into slot j.
        self.bearing[:, j] = self.bearing[:, frame_count]
        self.velocity[:, j] = self.velocity[:, frame_count]
        self.td_obs[:, j] = self.td_obs[:, frame_count]
        self.valid[:, j] = self.valid[:, frame_count]
        self.valid[:, frame_count] = False
        for s in np.where(live)[0]:
            if self.anchor[s] == frame_count:
                self.anchor[s] = j
            if not self.valid[s].any():
                self._free(s)

    def remove_failures(self):
        """Drop features whose solved depth is negative (removeFailures)."""
        bad = (self.feature_id >= 0) & (self.depth < 0) & (self.depth > -0.5)
        # depth == -1 means 'not yet triangulated', keep those; solved
        # negative depths are stored as-is by the caller before this call.
        for s in np.where(bad)[0]:
            self._free(s)

    def mark_solved_depths(self, inv_depth, used):
        """Write solver output back: depth = 1/inv_depth for used features;
        negative solutions flagged for removal (reference sets flag=2)."""
        for s in np.where(used)[0]:
            lam = float(inv_depth[s])
            if lam != 0.0:
                self.depth[s] = 1.0 / lam if lam > 0 else -0.1
            if self.depth[s] < 0 and self.depth[s] > -0.5:
                pass  # remove_failures() will free it

    def _free(self, s):
        self.feature_id[s] = -1
        self.valid[s] = False
        self.depth[s] = -1.0
        self.bearing[s] = 0.0
        self.velocity[s] = 0.0

    # ----------------------------------------------------------------- grid
    def device_grid_arrays(self):
        """Arrays for FeatureGrid construction (caller casts dtype)."""
        used = self.used_mask()
        return (
            self.bearing,
            self.velocity,
            self.td_obs,
            self.valid,
            self.anchor,
            used,
        )
