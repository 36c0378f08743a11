"""Image pyramid construction (device, conv-based).

Equivalent of the pyramid OpenCV builds inside calcOpticalFlowPyrLK
(reference call: feature_tracker.cpp:127, 3 levels): 5×5 Gaussian smoothing
followed by 2× decimation, expressed as one depthwise convolution per level
so XLA maps it onto the MXU/VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV pyrDown 5-tap kernel [1, 4, 6, 4, 1] / 16.
_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _blur_down(img):
    """5x5 separable Gaussian blur + 2x decimation. img: [H, W] float."""
    dtype = img.dtype
    k = jnp.asarray(_K5, dtype)
    x = img[None, None, :, :]  # NCHW
    kh = k.reshape(1, 1, 5, 1)
    kw = k.reshape(1, 1, 1, 5)
    x = jax.lax.conv_general_dilated(
        x, kh, window_strides=(1, 1), padding=((2, 2), (0, 0))
    )
    x = jax.lax.conv_general_dilated(
        x, kw, window_strides=(1, 1), padding=((0, 0), (2, 2))
    )
    return x[0, 0, ::2, ::2]


def gaussian_pyramid(img, n_levels: int = 3):
    """Returns [L0=img, L1, L2, ...] with n_levels+1 entries (matching
    OpenCV's maxLevel=3 convention of levels 0..3)."""
    levels = [img]
    for _ in range(n_levels):
        levels.append(_blur_down(levels[-1]))
    return levels


def scharr_gradients(img):
    """Scharr 3×3 x/y gradients (the operator cv::calcOpticalFlowPyrLK uses
    for the template derivatives), normalized by 1/32."""
    dtype = img.dtype
    kx = jnp.asarray([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]], dtype) / 32.0
    ky = kx.T
    x = img[None, None, :, :]
    gx = jax.lax.conv_general_dilated(
        x, kx[None, None], window_strides=(1, 1), padding="SAME"
    )[0, 0]
    gy = jax.lax.conv_general_dilated(
        x, ky[None, None], window_strides=(1, 1), padding="SAME"
    )[0, 0]
    return gx, gy
