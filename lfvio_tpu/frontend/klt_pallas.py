"""Pallas TPU kernel for batched pyramidal Lucas-Kanade optical flow.

Replaces the XLA formulation in klt.py (itself the TPU re-design of
cv::calcOpticalFlowPyrLK, reference feature_tracker.cpp:127 — 41×41 window,
3 pyramid levels) for the hot path. The XLA version is gather-bound: every
bilinear sample of every feature lowers to its own dynamic-slice DMA
(~90k tiny DMAs per frame ≈ 135 ms/frame on v5e). This kernel restructures
the computation around the TPU memory system:

  * Each feature's template (48×128) and search (56×128) patches are DMA'd
    from HBM into VMEM ONCE per level — 2 explicit DMAs per feature instead
    of hundreds of compiler-emitted gathers.
  * In-iteration bilinear resampling never gathers: both the y (sublane)
    and x (lane) interpolations are matmuls with banded shift matrices
    built from iota comparisons — the MXU does all the realignment.
    (Dynamic sublane slices are not used: Mosaic requires their offsets to
    be provably 8-aligned, which a data-dependent floor() is not.)
  * The 20 Gauss-Newton iterations run entirely on VMEM-resident data.

Roofline: per (feature, level): 2 DMAs × ~60 KB + ~21 resamples × ~2.3 MFLOP
(43×64×256 + 43×256×43 shift matmuls) ≈ 50 MFLOP. Full frame (256 features
× 4 levels): ~50 GFLOP MXU + ~120 MB HBM traffic → ~1 ms compute / 0.15 ms
memory at v5e f32 peak; measured numbers live in REPORT.md (driver-visible
benchmarks only).

Numerics match klt.py exactly in exact arithmetic (same template, Scharr-free
central-difference gradients, same clamps); parity is tested in
tests/test_klt_pallas.py against the XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .klt import WIN, HALF, SEARCH_MARGIN, PATCH, N_ITERS, MIN_EIG_THR, PAD

LANES = 256  # patch width per feature: 128-aligned DMA start + 41px window
TROWS = 56  # template patch rows: 8-aligned start + WIN+4=45 rows needed
SROWS = 64  # search patch rows: 8-aligned start + PATCH=54 rows needed
BF = 8  # features per grid step


def _shift_matrix(ix, fx, cols, dtype):
    """Banded lane-shift matrix S [LANES, cols]: (P @ S)[r, c] linearly
    interpolates P at lane ix + c + fx. Builds the x-axis bilinear gather as
    an MXU matmul instead of per-sample dynamic lane slices."""
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, cols), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, cols), 1)
    lo = (r_iota == ix + c_iota).astype(dtype)
    hi = (r_iota == ix + 1 + c_iota).astype(dtype)
    return lo * (1.0 - fx) + hi * fx


def _sample(patch_ref, oy, ox, rows, cols):
    """Bilinearly sample a rows×cols window at float offset (oy, ox) from a
    VMEM patch ref: one banded shift matmul per axis.

    The y (sublane) interpolation is also a matmul — Mosaic requires dynamic
    sublane-slice offsets to be provably 8-aligned (vector.load constraint),
    which the data-dependent floor(oy) is not; a [rows, prows] selection
    matrix built from iota comparisons has fully static shapes and rides the
    MXU instead. Rows whose source index falls outside the patch produce 0,
    which is strictly safer than a clamped slice (such features are border-
    rejected anyway)."""
    dtype = patch_ref.dtype
    prows = patch_ref.shape[0]
    iy = jnp.floor(oy).astype(jnp.int32)
    ix = jnp.floor(ox).astype(jnp.int32)
    fy = (oy - iy.astype(dtype)).astype(dtype)
    fx = (ox - ix.astype(dtype)).astype(dtype)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, prows), 0)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, prows), 1)
    lo = (q_iota == iy + r_iota).astype(dtype)
    hi = (q_iota == iy + 1 + r_iota).astype(dtype)
    Sy = lo * (1.0 - fy) + hi * fy
    y_interp = jnp.dot(Sy, patch_ref[:], preferred_element_type=jnp.float32)
    S = _shift_matrix(ix, fx, cols, dtype)
    return jnp.dot(y_interp, S, preferred_element_type=jnp.float32)


def _lk_level_kernel(
    posg_ref,  # SMEM [BF, 4]: (pos_x, pos_y, guess_x, guess_y)
    act_ref,  # SMEM [BF, 1]: 1.0 = track this feature
    img_prev_ref,  # HBM [Hp, Wp] (padded level image)
    img_next_ref,  # HBM [Hp, Wp]
    out_ref,  # SMEM [BF, 4]: (gx, gy, ok, reserved)
    tpatch,  # VMEM scratch [TROWS, LANES]
    spatch,  # VMEM scratch [SROWS, LANES]
    sems,  # DMA semaphores (2,)
):
    Hp, Wp = img_prev_ref.shape
    dtype = jnp.float32

    for f in range(BF):
        px = posg_ref[f, 0]
        py = posg_ref[f, 1]
        gx0 = posg_ref[f, 2]
        gy0 = posg_ref[f, 3]
        act = act_ref[f, 0] > 0.5

        # ---- template patch (prev image, fixed during iterations) --------
        # DMA starts are aligned down to the (8, 128) f32 tile so Mosaic can
        # prove the memref slice is tile-aligned regardless of where the
        # compiler places the level image; the fractional remainder moves
        # into the in-patch sampling offset.
        tlx = jnp.clip(
            jnp.floor(px).astype(jnp.int32) - HALF - 2, 0, Wp - LANES
        )
        tlx = (tlx // 128) * 128
        tly = jnp.clip(
            jnp.floor(py).astype(jnp.int32) - HALF - 2, 0, Hp - TROWS
        )
        tly = (tly // 8) * 8
        tdma = pltpu.make_async_copy(
            img_prev_ref.at[pl.ds(tly, TROWS), pl.ds(tlx, LANES)],
            tpatch,
            sems.at[0],
        )
        tdma.start()

        # ---- search patch (next image around the prior guess) ------------
        slx = jnp.clip(
            jnp.floor(px + gx0).astype(jnp.int32) - HALF - SEARCH_MARGIN,
            0,
            Wp - LANES,
        )
        slx = (slx // 128) * 128
        sly = jnp.clip(
            jnp.floor(py + gy0).astype(jnp.int32) - HALF - SEARCH_MARGIN,
            0,
            Hp - SROWS,
        )
        sly = (sly // 8) * 8
        sdma = pltpu.make_async_copy(
            img_next_ref.at[pl.ds(sly, SROWS), pl.ds(slx, LANES)],
            spatch,
            sems.at[1],
        )
        sdma.start()
        tdma.wait()

        # Template + central-difference gradients from one (WIN+2)² sample.
        off_ty = py - tly.astype(dtype) - HALF
        off_tx = px - tlx.astype(dtype) - HALF
        T_ext = _sample(tpatch, off_ty - 1.0, off_tx - 1.0, WIN + 2, WIN + 2)
        T = T_ext[1:-1, 1:-1]
        Tx = 0.5 * (T_ext[1:-1, 2:] - T_ext[1:-1, :-2])
        Ty = 0.5 * (T_ext[2:, 1:-1] - T_ext[:-2, 1:-1])

        Gxx = jnp.sum(Tx * Tx)
        Gxy = jnp.sum(Tx * Ty)
        Gyy = jnp.sum(Ty * Ty)
        det = Gxx * Gyy - Gxy * Gxy
        tr = Gxx + Gyy
        min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        good_G = min_eig / (WIN * WIN) > MIN_EIG_THR
        inv_det = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12), 0.0)

        sdma.wait()

        def body(_, carry):
            gx, gy, live = carry
            oy = py + gy - sly.astype(dtype) - HALF
            ox = px + gx - slx.astype(dtype) - HALF
            oy = jnp.clip(oy, 0.0, SROWS - WIN - 1.0)
            ox = jnp.clip(ox, 0.0, LANES - WIN - 1.0)
            S = _sample(spatch, oy, ox, WIN, WIN)
            r = S - T
            bx = jnp.sum(Tx * r)
            by = jnp.sum(Ty * r)
            dx = -(Gyy * bx - Gxy * by) * inv_det
            dy = -(Gxx * by - Gxy * bx) * inv_det
            dx = jnp.clip(dx, -2.0, 2.0)
            dy = jnp.clip(dy, -2.0, 2.0)
            gx_n = jnp.where(live, gx + dx, gx)
            gy_n = jnp.where(live, gy + dy, gy)
            still = live & (dx * dx + dy * dy > 1e-4)  # cv eps 0.01²
            return gx_n, gy_n, still

        gx_f, gy_f, _ = jax.lax.fori_loop(
            0, N_ITERS, body, (gx0, gy0, good_G & act)
        )

        # Sample-window containment of the final position (matches klt.py's
        # off_ok; the real-image border check runs outside the kernel).
        fy_off = py + gy_f - sly.astype(dtype) - HALF
        fx_off = px + gx_f - slx.astype(dtype) - HALF
        off_ok = (
            (fy_off >= 0.0)
            & (fy_off <= SROWS - WIN - 1)
            & (fx_off >= 0.0)
            & (fx_off <= LANES - WIN - 1)
        )
        ok = act & good_G & off_ok
        out_ref[f, 0] = gx_f
        out_ref[f, 1] = gy_f
        out_ref[f, 2] = ok.astype(dtype)
        out_ref[f, 3] = min_eig


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lk_level_pallas(img_prev_pad, img_next_pad, posg, act, interpret=False):
    """One pyramid level for all N features. posg [N,4], act [N,1] f32."""
    N = posg.shape[0]
    grid = (N // BF,)
    out = pl.pallas_call(
        _lk_level_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BF, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BF, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (BF, 4), lambda i: (i, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TROWS, LANES), jnp.float32),
            pltpu.VMEM((SROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(posg, act, img_prev_pad, img_next_pad)
    return out


def pyramidal_lk_pallas(
    pyr_prev, pyr_next, pts_prev, valid, n_levels: int = 3, interpret=None
):
    """Drop-in replacement for klt.pyramidal_lk using the Pallas kernel.

    pts_prev [N,2] (x, y) full-res pixels; returns (pts_next [N,2], ok [N]).
    N is padded to a multiple of BF internally. interpret=None auto-selects
    interpreter mode off-TPU (so the same code path is testable on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = pts_prev.shape[0]
    dtype = pyr_prev[0].dtype
    Np = ((N + BF - 1) // BF) * BF
    pad_n = Np - N

    g = jnp.zeros((Np, 2), dtype)
    ok = jnp.concatenate([valid, jnp.zeros((pad_n,), bool)])
    pts = jnp.concatenate([pts_prev, jnp.zeros((pad_n, 2), dtype)], axis=0)

    for l in range(n_levels, -1, -1):
        if min(pyr_prev[l].shape) >= 8:
            scale = 2.0**l
            prev_pad = jnp.pad(pyr_prev[l], PAD, mode="edge")
            next_pad = jnp.pad(pyr_next[l], PAD, mode="edge")
            # Tile-align the padded level so aligned DMA windows always fit.
            Hp, Wp = prev_pad.shape
            Ht = max(-(-Hp // 8) * 8, SROWS)
            Wt = max(-(-Wp // 128) * 128, LANES)
            prev_pad = jnp.pad(
                prev_pad, ((0, Ht - Hp), (0, Wt - Wp)), mode="edge"
            )
            next_pad = jnp.pad(
                next_pad, ((0, Ht - Hp), (0, Wt - Wp)), mode="edge"
            )
            pos_l = pts / scale + PAD
            posg = jnp.concatenate([pos_l, g], axis=1).astype(jnp.float32)
            out = _lk_level_pallas(
                prev_pad.astype(jnp.float32),
                next_pad.astype(jnp.float32),
                posg,
                ok.astype(jnp.float32)[:, None],
                interpret=interpret,
            )
            g = out[:, 0:2].astype(dtype)
            ok_l = out[:, 2] > 0.5
            ok = ok & ok_l
            # Real-image border containment at this level (klt.py's inb).
            H0, W0 = pyr_prev[l].shape
            fx = pos_l[:, 0] + g[:, 0]
            fy = pos_l[:, 1] + g[:, 1]
            inb = (
                (fx >= PAD + 1.0)
                & (fx < PAD + W0 - 1.0)
                & (fy >= PAD + 1.0)
                & (fy < PAD + H0 - 1.0)
            )
            ok = ok & inb
        if l > 0:
            g = g * 2.0
    pts_next = pts + g
    return pts_next[:N], ok[:N]
