"""Batched pyramidal Lucas-Kanade optical flow.

Replaces cv::calcOpticalFlowPyrLK (reference feature_tracker.cpp:127 —
41×41 window, 3 pyramid levels) with a fully batched JAX implementation:
all N feature tracks advance together through a fixed iteration schedule, so
the whole tracker is one XLA computation. Patch extraction is done once per
(feature, level) into a cached search window; the inner Gauss-Newton
iterations resample only within that patch.

Design notes (TPU):
  * vmapped dynamic_slice patch extraction = one gather per level.
  * In-iteration bilinear sampling uses 4 shifted static slices of the cached
    patch — no gathers inside the iteration loop.
  * Fixed iteration counts with convergence masking (no data-dependent
    control flow).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

WIN = 41  # correlation window (reference: cv::Size(41, 41))
HALF = WIN // 2
SEARCH_MARGIN = 6  # extra px the iterations may move within the cached patch
PATCH = WIN + 1 + 2 * SEARCH_MARGIN  # cached search-window side
N_ITERS = 20  # per level (cv default 30 w/ eps 0.01)
MIN_EIG_THR = 1e-4  # per-pixel-normalized min eigenvalue gate (cv: 1e-4)


def _extract_patch(img, topleft, size):
    """Integer-aligned dynamic-slice patch extraction with border clamping."""
    return jax.lax.dynamic_slice(img, (topleft[0], topleft[1]), (size, size))


def _bilinear_from_patch(patch, offset, out_size):
    """Sample an out_size² window from patch at fractional offset (y, x).

    offset is relative to the patch origin. Uses 4 shifted dynamic slices +
    bilinear weights; valid while 0 <= offset <= PATCH - out_size - 1."""
    oy = jnp.clip(offset[0], 0.0, patch.shape[0] - out_size - 1)
    ox = jnp.clip(offset[1], 0.0, patch.shape[1] - out_size - 1)
    iy = jnp.floor(oy).astype(jnp.int32)
    ix = jnp.floor(ox).astype(jnp.int32)
    fy = oy - iy
    fx = ox - ix
    p00 = jax.lax.dynamic_slice(patch, (iy, ix), (out_size, out_size))
    p01 = jax.lax.dynamic_slice(patch, (iy, ix + 1), (out_size, out_size))
    p10 = jax.lax.dynamic_slice(patch, (iy + 1, ix), (out_size, out_size))
    p11 = jax.lax.dynamic_slice(patch, (iy + 1, ix + 1), (out_size, out_size))
    return (
        p00 * (1 - fy) * (1 - fx)
        + p01 * (1 - fy) * fx
        + p10 * fy * (1 - fx)
        + p11 * fy * fx
    )


PAD = HALF + SEARCH_MARGIN + 4  # edge-replication pad so windows never clip


def _track_level(img_prev, img_next, pos_prev_l, guess, valid):
    """One pyramid level of LK for all features.

    pos_prev_l: [N, 2] (x, y) feature positions in this level's coordinates.
    guess: [N, 2] current flow estimate at this level's scale.
    Returns (new_guess [N,2], ok [N]).

    Both level images are edge-padded by PAD so the 41-px window (huge
    relative to coarse levels) never clips — the same effect as OpenCV's
    border handling in calcOpticalFlowPyrLK.
    """
    H0, W0 = img_prev.shape
    img_prev = jnp.pad(img_prev, PAD, mode="edge")
    img_next = jnp.pad(img_next, PAD, mode="edge")
    pos_prev_l = pos_prev_l + PAD
    H, W = img_prev.shape
    dtype = img_prev.dtype

    def one(pos, g, ok):
        # --- template patch from prev image (fixed during iterations) ------
        # Patch size WIN+4: template offset lands in [2,3), gradient samples
        # at ±1 stay within [1,4), so all 4 bilinear corners are in bounds.
        TP = WIN + 4
        tl_t = jnp.stack(
            [
                jnp.clip(jnp.floor(pos[1]) - HALF - 2, 0, H - TP),
                jnp.clip(jnp.floor(pos[0]) - HALF - 2, 0, W - TP),
            ]
        ).astype(jnp.int32)
        tpatch = _extract_patch(img_prev, tl_t, TP)
        off_t = jnp.stack([pos[1] - tl_t[0] - HALF, pos[0] - tl_t[1] - HALF])
        # template + central-difference gradients, all from one padded patch
        T = _bilinear_from_patch(tpatch, off_t, WIN)
        Txp = _bilinear_from_patch(tpatch, off_t + jnp.asarray([0.0, 1.0], dtype), WIN)
        Txm = _bilinear_from_patch(tpatch, off_t + jnp.asarray([0.0, -1.0], dtype), WIN)
        Typ = _bilinear_from_patch(tpatch, off_t + jnp.asarray([1.0, 0.0], dtype), WIN)
        Tym = _bilinear_from_patch(tpatch, off_t + jnp.asarray([-1.0, 0.0], dtype), WIN)
        Tx = 0.5 * (Txp - Txm)
        Ty = 0.5 * (Typ - Tym)

        Gxx = jnp.sum(Tx * Tx)
        Gxy = jnp.sum(Tx * Ty)
        Gyy = jnp.sum(Ty * Ty)
        det = Gxx * Gyy - Gxy * Gxy
        tr = Gxx + Gyy
        min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        good_G = min_eig / (WIN * WIN) > MIN_EIG_THR
        inv_det = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12), 0.0)

        # --- search patch from next image around expected location ---------
        target = pos + g
        tl_s = jnp.stack(
            [
                jnp.clip(
                    jnp.floor(target[1]) - HALF - SEARCH_MARGIN, 0, H - PATCH
                ),
                jnp.clip(
                    jnp.floor(target[0]) - HALF - SEARCH_MARGIN, 0, W - PATCH
                ),
            ]
        ).astype(jnp.int32)
        spatch = _extract_patch(img_next, tl_s, PATCH)

        def body(k, carry):
            gk, active = carry
            off = jnp.stack(
                [pos[1] + gk[1] - tl_s[0] - HALF, pos[0] + gk[0] - tl_s[1] - HALF]
            )
            S = _bilinear_from_patch(spatch, off, WIN)
            r = S - T
            bx = jnp.sum(Tx * r)
            by = jnp.sum(Ty * r)
            dx = -(Gyy * bx - Gxy * by) * inv_det
            dy = -(Gxx * by - Gxy * bx) * inv_det
            step = jnp.stack([dx, dy])
            step = jnp.clip(step, -2.0, 2.0)
            gk_new = jnp.where(active, gk + step, gk)
            still = active & (jnp.sum(step * step) > 1e-4)  # cv eps 0.01^2
            return gk_new, still

        g_fin, _ = jax.lax.fori_loop(0, N_ITERS, body, (g, good_G & ok))

        # Border validity of the final position in REAL image coordinates.
        fx = pos[0] + g_fin[0]
        fy = pos[1] + g_fin[1]
        inb = (
            (fx >= PAD + 1.0)
            & (fx < PAD + W0 - 1.0)
            & (fy >= PAD + 1.0)
            & (fy < PAD + H0 - 1.0)
        )
        # Also require the sample window stayed inside the cached patch.
        off_ok = (
            (fy - tl_s[0] - HALF >= 0.0)
            & (fy - tl_s[0] - HALF <= PATCH - WIN - 1)
            & (fx - tl_s[1] - HALF >= 0.0)
            & (fx - tl_s[1] - HALF <= PATCH - WIN - 1)
        )
        return g_fin, ok & good_G & inb & off_ok

    return jax.vmap(one)(pos_prev_l, guess, valid)


def pyramidal_lk(pyr_prev, pyr_next, pts_prev, valid, n_levels: int = 3):
    """Track pts_prev ([N, 2] (x, y) full-res pixels) from pyr_prev to
    pyr_next. Returns (pts_next [N, 2], status [N] bool).

    pyr_*: lists of level images from gaussian_pyramid (len n_levels+1).
    """
    N = pts_prev.shape[0]
    dtype = pyr_prev[0].dtype
    g = jnp.zeros((N, 2), dtype)
    ok = valid
    for l in range(n_levels, -1, -1):
        if min(pyr_prev[l].shape) >= 8:  # skip degenerate tiny levels
            scale = 2.0**l
            pos_l = pts_prev / scale
            g, ok_l = _track_level(pyr_prev[l], pyr_next[l], pos_l, g, ok)
            ok = ok & ok_l
        if l > 0:
            g = g * 2.0
    pts_next = pts_prev + g
    return pts_next, ok
