"""Device-side 4-DoF yaw-gauge fix.

The sliding-window BA has an unobservable global yaw + position; the
reference removes the drift after every solve by rotating the solution so
frame 0 keeps its pre-solve yaw and position (double2vector,
/root/reference/vins_estimator/src/estimator.cpp:532-626). Running it on
device (instead of the round 1 host implementation) lets the fused frame
step marginalize at the gauge-fixed state without a host round trip —
matching the reference's order (vector2double at the start of the
marginalization block re-reads the fixed state).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..geom import (
    quat_to_mat,
    mat_to_quat,
    quat_normalize,
    R_to_ypr_deg,
    ypr_deg_to_R,
)
from .state import WindowState


def yaw_gauge_transform(out: WindowState, origin_p0, origin_q0):
    """The gauge correction (rot_diff, pivot) that re-anchors frame 0 to
    its pre-solve yaw/position (see yaw_gauge_fix)."""
    R_origin = quat_to_mat(origin_q0)
    ypr_origin = R_to_ypr_deg(R_origin)
    R00 = quat_to_mat(out.q[0])
    ypr_new = R_to_ypr_deg(R00)
    y_diff = ypr_origin[0] - ypr_new[0]
    rot_yaw = ypr_deg_to_R(
        jnp.stack([y_diff, jnp.zeros_like(y_diff), jnp.zeros_like(y_diff)])
    )
    singular = (jnp.abs(jnp.abs(ypr_origin[1]) - 90.0) < 1.0) | (
        jnp.abs(jnp.abs(ypr_new[1]) - 90.0) < 1.0
    )
    rot_diff = jnp.where(singular, R_origin @ R00.T, rot_yaw)
    return rot_diff, out.p[0]


def gauge_apply_pose(rot_diff, pivot, origin_p0, p, q):
    """Apply the window's gauge correction to an EXTRA pose (the
    relocalization loop pose rides the same correction — the reference
    rotates relo_Pose with rot_diff in double2vector, estimator.cpp:605-611).
    """
    p_new = rot_diff @ (p - pivot) + origin_p0
    q_new = quat_normalize(mat_to_quat(rot_diff @ quat_to_mat(q)))
    return p_new, q_new


def yaw_gauge_fix(out: WindowState, origin_p0, origin_q0) -> WindowState:
    """Rotate/translate the solved window so frame 0 recovers the yaw and
    position it had before the solve (origin_p0/origin_q0).

    The Euler-singularity branch (|pitch| ~ 90 deg) falls back to a full
    rotation re-anchor, as the reference does (estimator.cpp:568-576).
    """
    rot_diff, pivot = yaw_gauge_transform(out, origin_p0, origin_q0)
    p = (out.p - pivot) @ rot_diff.T + origin_p0
    v = out.v @ rot_diff.T
    R_all = quat_to_mat(out.q)  # [W+1, 3, 3]
    q = quat_normalize(mat_to_quat(rot_diff[None] @ R_all))
    return dataclasses.replace(out, p=p, q=q, v=v)
