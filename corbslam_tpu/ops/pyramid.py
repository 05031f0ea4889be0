"""Image pyramid + Gaussian blur.

Replaces `ORBextractor::ComputePyramid` (ref:
corbslam_client/src/ORBextractor.cc:1107 — per-level cv::resize +
cv::GaussianBlur(7x7, sigma=2) before descriptor sampling) with XLA ops:
bilinear resize (gather-based) and separable 1-D convolutions that XLA maps
onto fused VPU loops. All shapes are static per (H, W, n_levels) config, so
each pyramid level is its own fixed-shape op under one jit.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static per-level (h, w) sizes, mirroring inv_scale^level."""
    out = []
    for lvl in range(n_levels):
        s = 1.0 / (scale ** lvl)
        out.append((max(int(round(h * s)), 16), max(int(round(w * s)), 16)))
    return out


def resize_bilinear(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """[H, W] -> [h, w] bilinear; jax.image.resize lowers to XLA gathers."""
    return jax.image.resize(img, out_hw, method="bilinear")


def gaussian_kernel_1d(size: int = 7, sigma: float = 2.0) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("size", "sigma"))
def gaussian_blur(img: jnp.ndarray, size: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding, [H, W] f32."""
    k = jnp.asarray(gaussian_kernel_1d(size, sigma))
    pad = size // 2
    # Rows then columns; use conv on the last axis for lane-friendly layout.
    x = jnp.pad(img, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    x = jnp.pad(x, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    return x


def build_pyramid(img: jnp.ndarray, n_levels: int, scale: float):
    """Returns (levels, blurred_levels): two lists of [h_l, w_l] f32 arrays.

    `levels` feed FAST detection; `blurred_levels` feed orientation/BRIEF
    sampling (the reference blurs only for descriptor computation,
    ORBextractor.cc:1026-1041).
    """
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = []
    for lvl, hw in enumerate(shapes):
        levels.append(img if lvl == 0 else resize_bilinear(levels[-1], hw))
    blurred = [gaussian_blur(x) for x in levels]
    return levels, blurred
