"""Parity of the Pallas LK kernel vs the XLA reference implementation.

Runs the Pallas kernel in interpreter mode on CPU (identical semantics to
the compiled TPU kernel) against klt.pyramidal_lk on a textured synthetic
scene with a known sub-pixel shift.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from lfvio_tpu.frontend import gaussian_pyramid
from lfvio_tpu.frontend.klt import pyramidal_lk
from lfvio_tpu.frontend.klt_pallas import pyramidal_lk_pallas


def _textured(H, W, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((H // 8, W // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    # Smooth a little so gradients are informative.
    k = np.ones((5, 5), np.float32) / 25.0
    from scipy.signal import convolve2d

    return convolve2d(img, k, mode="same").astype(np.float32) * 255.0


def _shifted(img, dx, dy):
    """Bilinear shift of the image by (dx, dy)."""
    H, W = img.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    xs = np.clip(xx + dx, 0, W - 1.001)
    ys = np.clip(yy + dy, 0, H - 1.001)
    x0 = xs.astype(int)
    y0 = ys.astype(int)
    fx = xs - x0
    fy = ys - y0
    return (
        img[y0, x0] * (1 - fy) * (1 - fx)
        + img[y0, x0 + 1] * (1 - fy) * fx
        + img[y0 + 1, x0] * fy * (1 - fx)
        + img[y0 + 1, x0 + 1] * fy * fx
    ).astype(np.float32)


@pytest.mark.slow
def test_pallas_lk_matches_xla():
    H, W = 240, 320
    dx, dy = 3.3, -2.6
    img0 = _textured(H, W)
    img1 = _shifted(img0, -dx, -dy)  # features move by (+dx, +dy)

    rng = np.random.default_rng(1)
    N = 24
    pts = np.stack(
        [rng.uniform(60, W - 60, N), rng.uniform(60, H - 60, N)], -1
    ).astype(np.float32)
    valid = np.ones(N, bool)
    valid[-2:] = False

    pyr0 = [jnp.asarray(x) for x in gaussian_pyramid(jnp.asarray(img0), 2)]
    pyr1 = [jnp.asarray(x) for x in gaussian_pyramid(jnp.asarray(img1), 2)]

    ref_pts, ref_ok = pyramidal_lk(
        pyr0, pyr1, jnp.asarray(pts), jnp.asarray(valid), 2
    )
    pal_pts, pal_ok = pyramidal_lk_pallas(
        pyr0, pyr1, jnp.asarray(pts), jnp.asarray(valid), 2, interpret=True
    )
    ref_pts = np.asarray(ref_pts)
    pal_pts = np.asarray(pal_pts)
    ref_ok = np.asarray(ref_ok)
    pal_ok = np.asarray(pal_ok)

    assert not pal_ok[-2:].any()  # invalid stay invalid
    both = ref_ok & pal_ok
    assert both.sum() >= N - 6
    # Pallas tracks agree with XLA tracks to sub-0.1px.
    d = np.linalg.norm(ref_pts[both] - pal_pts[both], axis=-1)
    assert d.max() < 0.1, d.max()
    # And both recover the true shift.
    err = np.linalg.norm(pal_pts[both] - (pts[both] + [dx, dy]), axis=-1)
    assert np.median(err) < 0.35, np.median(err)
