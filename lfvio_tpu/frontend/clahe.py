"""CLAHE (contrast-limited adaptive histogram equalization) on device.

Equivalent of cv::createCLAHE(3.0, Size(8,8))->apply (reference
feature_tracker.cpp:101-107). TPU formulation avoids scatter-based
histograms: per-tile histograms come from sort + searchsorted (XLA sorts are
fast on TPU; scatters are not), histogram clipping redistributes the excess
uniformly, and the per-pixel LUT lookup is a small gather blended bilinearly
between the 4 neighboring tile LUTs (cv's interpolation scheme).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clahe(img, clip_limit: float = 3.0, grid: int = 8, n_bins: int = 256):
    """img: [H, W] float in [0, 255]. Returns equalized image, same range.

    H and W must be divisible by grid (1280×960 / 8 = 160×120, true for the
    PAL rig; other rigs pad beforehand).
    """
    H, W = img.shape
    dtype = img.dtype
    th, tw = H // grid, W // grid
    npix = th * tw

    vals = jnp.clip(img, 0.0, 255.0)
    tiles = vals.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(
        grid * grid, npix
    )

    # Histogram per tile, scatterless: counts[t, b] = #pixels < edge_b via a
    # fused compare+reduce (bit-identical to sort+searchsorted, ~14x faster
    # to compile on Mosaic, same runtime).
    edges = jnp.arange(1, n_bins + 1, dtype=dtype) * (256.0 / n_bins)
    counts = jnp.sum(
        (tiles[:, None, :] < edges[None, :, None]).astype(dtype), axis=-1
    )
    hist = jnp.diff(jnp.concatenate([jnp.zeros((grid * grid, 1), dtype), counts], axis=1))

    # Clip + uniform redistribution (cv semantics: clipLimit scaled by tile size).
    clip = jnp.maximum(clip_limit * npix / n_bins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / n_bins

    cdf = jnp.cumsum(hist, axis=-1)
    # LUT: map bin -> equalized value, scaling cdf to [0, 255].
    lut = (cdf - cdf[:, :1]) / jnp.maximum(npix - cdf[:, :1], 1.0) * 255.0
    lut = jnp.clip(lut, 0.0, 255.0)  # [T, n_bins]
    lut = lut.reshape(grid, grid, n_bins)

    # Bilinear blend of the 4 neighboring tile LUTs per pixel.
    yy = jnp.arange(H, dtype=dtype)[:, None]
    xx = jnp.arange(W, dtype=dtype)[None, :]
    gy = jnp.clip(yy / th - 0.5, 0.0, grid - 1.0)
    gx = jnp.clip(xx / tw - 0.5, 0.0, grid - 1.0)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, grid - 1)
    x1 = jnp.minimum(x0 + 1, grid - 1)
    fy = gy - y0
    fx = gx - x0

    bin_idx = jnp.clip(
        (vals * (n_bins / 256.0)).astype(jnp.int32), 0, n_bins - 1
    )
    y0b = jnp.broadcast_to(y0, (H, W))
    x0b = jnp.broadcast_to(x0, (H, W))
    y1b = jnp.broadcast_to(y1, (H, W))
    x1b = jnp.broadcast_to(x1, (H, W))

    v00 = lut[y0b, x0b, bin_idx]
    v01 = lut[y0b, x1b, bin_idx]
    v10 = lut[y1b, x0b, bin_idx]
    v11 = lut[y1b, x1b, bin_idx]
    fyb = jnp.broadcast_to(fy, (H, W))
    fxb = jnp.broadcast_to(fx, (H, W))
    return (
        v00 * (1 - fyb) * (1 - fxb)
        + v01 * (1 - fyb) * fxb
        + v10 * fyb * (1 - fxb)
        + v11 * fyb * fxb
    )
