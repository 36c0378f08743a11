"""Shi-Tomasi corner detection with annulus masking and spacing NMS.

Equivalent of the reference's detect path (feature_tracker.cpp:46-83,166):
cv::goodFeaturesToTrack(maxCorners, qualityLevel=0.01, minDistance=MIN_DIST,
mask) where mask = PAL annulus minus disks stamped around surviving tracks.

TPU formulation: dense min-eigenvalue response map via convolutions, masking
via a dilated occupancy map (reduce_window max — a square structuring element
instead of the reference's stamped circles, slightly stricter in the
corners), 3×3 local-max NMS, then one top-k over the masked response.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def shi_tomasi_response(img, block_size: int = 3):
    """Min-eigenvalue corner response (cv::goodFeaturesToTrack's score).

    Stencils are shifted adds (see pyramid.py TPU note): Sobel is separable
    smooth[1,2,1] ∘ diff[-1,0,1], the box sum is two 3-tap passes."""
    from .pyramid import _shift

    sm_y = _shift(img, -1, 0) + 2.0 * img + _shift(img, 1, 0)
    gx = (_shift(sm_y, 0, 1) - _shift(sm_y, 0, -1)) / 8.0
    sm_x = _shift(img, 0, -1) + 2.0 * img + _shift(img, 0, 1)
    gy = (_shift(sm_x, 1, 0) - _shift(sm_x, -1, 0)) / 8.0

    def box3(x):
        r = _shift(x, -1, 0) + x + _shift(x, 1, 0)
        return (_shift(r, 0, -1) + r + _shift(r, 0, 1)) / (
            block_size * block_size
        )

    Ixx = box3(gx * gx)
    Ixy = box3(gx * gy)
    Iyy = box3(gy * gy)
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    return 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))


def annulus_mask(shape, center_x, center_y, max_r, min_r, dtype=jnp.float32):
    """PAL annulus mask (reference setMask, feature_tracker.cpp:52-57)."""
    H, W = shape
    yy = jnp.arange(H, dtype=dtype)[:, None]
    xx = jnp.arange(W, dtype=dtype)[None, :]
    r2 = (xx - center_x) ** 2 + (yy - center_y) ** 2
    return (r2 <= max_r**2) & (r2 >= min_r**2)


def occupancy_dilated(shape, pts, valid, min_dist: int):
    """Boolean map that is True within a (2*min_dist+1) square around any
    valid point — the 'too close to an existing track' exclusion zone."""
    H, W = shape
    occ = jnp.zeros((H, W), jnp.float32)
    iy = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32), 0, H - 1)
    ix = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32), 0, W - 1)
    occ = occ.at[iy, ix].max(valid.astype(jnp.float32))
    k = 2 * min_dist + 1
    dil = jax.lax.reduce_window(
        occ, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return dil > 0.5


def select_features(
    response,
    static_mask,
    existing_pts,
    existing_valid,
    n_new: int,
    min_dist: int,
    quality_level: float = 0.01,
):
    """Pick up to n_new corners: masked response, local-max NMS, top-k, then
    one greedy spacing pass among the selected (they may be within min_dist
    of each other; the reference's sequential stamping forbids that).

    Returns (pts [n_new, 2] float (x, y), ok [n_new] bool).
    """
    H, W = response.shape
    excl = occupancy_dilated((H, W), existing_pts, existing_valid, min_dist)
    resp = jnp.where(static_mask & ~excl, response, 0.0)
    # Kill the zero-padding convolution artifacts near the image border
    # (OpenCV's reflected borders have no such ridge).
    B = 5
    border = jnp.zeros((H, W), bool).at[B:-B, B:-B].set(True)
    resp = jnp.where(border, resp, 0.0)
    # quality gate relative to the max response (cv semantics)
    resp = jnp.where(resp >= quality_level * jnp.max(resp), resp, 0.0)
    # 3x3 local maxima
    local_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    resp = jnp.where(resp >= local_max, resp, 0.0)

    # Oversample candidates, then greedily enforce min_dist among them.
    n_cand = min(4 * n_new, H * W)
    vals, idx = jax.lax.top_k(resp.reshape(-1), n_cand)
    cy = (idx // W).astype(jnp.float32)
    cx = (idx % W).astype(jnp.float32)
    cand_ok = vals > 0.0

    # Greedy spacing among candidates (scan over candidates, strongest first).
    md2 = jnp.asarray(float(min_dist * min_dist), response.dtype)

    def body(carry, i):
        taken_x, taken_y, taken_ok, count = carry
        d2 = (taken_x - cx[i]) ** 2 + (taken_y - cy[i]) ** 2
        clash = jnp.any(taken_ok & (d2 < md2))
        ok = cand_ok[i] & ~clash & (count < n_new)
        taken_x = taken_x.at[i].set(jnp.where(ok, cx[i], -1e9))
        taken_y = taken_y.at[i].set(jnp.where(ok, cy[i], -1e9))
        taken_ok = taken_ok.at[i].set(ok)
        return (taken_x, taken_y, taken_ok, count + ok.astype(jnp.int32)), ok

    init = (
        jnp.full((n_cand,), -1e9, jnp.float32),
        jnp.full((n_cand,), -1e9, jnp.float32),
        jnp.zeros((n_cand,), bool),
        jnp.zeros((), jnp.int32),
    )
    (tx, ty, tok, _), _ = jax.lax.scan(body, init, jnp.arange(n_cand))

    # Compact the selected candidates to the first n_new slots by sorting on
    # (-ok, candidate order): selected keep their strength ordering.
    order = jnp.argsort(~tok, stable=True)[:n_new]
    pts = jnp.stack([tx[order], ty[order]], axis=-1)
    ok = tok[order]
    pts = jnp.where(ok[:, None], pts, 0.0)
    return pts, ok
