"""Stereo correspondence for extracted features.

Replaces `Frame::ComputeStereoMatches` (ref:
corbslam_client/src/Frame.cc:470): for each left-image keypoint, find the
matching column in the right image along the same (rectified) row, giving
u_right and depth = bf / disparity.

Reference algorithm: per-row candidate lists of right keypoints, best
descriptor match within a disparity band, then an 11-px SAD slide of a
11x11 patch for sub-pixel refinement with parabola interpolation, then an
outlier cut at 2x median SAD. TPU re-design, batched over all keypoints:

  1. candidate mask = |row difference| <= 2 px-at-octave AND disparity in
     [min_d, max_d]  ->  masked Hamming matmul (one MXU call)
  2. SAD refinement: gather a W x W patch around the left keypoint and
     2R+1 shifted patches around the right match; best + parabola subpixel
  3. validity: descriptor distance, SAD margin, disparity in range.

`compute_stereo_from_rgbd` is the RGB-D analog (Frame.cc:647): fake
disparity from a depth map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import descriptors as D

PATCH_W = 5  # half-width of the SAD patch (11x11 like the reference)
SLIDE_R = 5  # +-5 px refinement slide (Frame.cc:552 L=5)


def _gather_patch_rows(img, yc, xc, half, offsets_x):
    """Gather [K, (2*half+1)^2] patches at integer centers (yc, xc) shifted
    by offsets_x [K] along x. Returns [K, n_shift, patch] where offsets_x is
    [K, n_shift]."""
    K, S = offsets_x.shape
    dy = jnp.arange(-half, half + 1)
    dx = jnp.arange(-half, half + 1)
    yy = yc[:, None, None, None] + dy[None, None, :, None]          # [K,1,P,1]
    xx = xc[:, None, None, None] + offsets_x[:, :, None, None] + dx[None, None, None, :]
    h, w = img.shape
    yy = jnp.clip(yy, 0, h - 1)
    xx = jnp.clip(xx, 0, w - 1)
    yy = jnp.broadcast_to(yy, (K, S, dy.shape[0], dx.shape[0]))
    xx = jnp.broadcast_to(xx, (K, S, dy.shape[0], dx.shape[0]))
    return img[yy, xx].reshape(K, S, -1)


@partial(jax.jit, static_argnames=("max_disp",))
def match_stereo(
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    xy_l: jnp.ndarray,
    octave_l: jnp.ndarray,
    desc_l: jnp.ndarray,
    valid_l: jnp.ndarray,
    xy_r: jnp.ndarray,
    octave_r: jnp.ndarray,
    desc_r: jnp.ndarray,
    valid_r: jnp.ndarray,
    scale_factors: jnp.ndarray,
    bf: float,
    max_disp: int = 192,
    max_hamming: int = 80,
):
    """Returns (u_right [N], depth [N], ok [N]) for left features.

    u_right < 0 marks monocular points (the reference convention,
    Frame.cc:644 mvuRight = -1).
    """
    # 1. Row + disparity band candidate mask [Nl, Nr].
    row_tol = 2.0 * scale_factors[octave_r]  # reference: +-2 sigma rows (Frame.cc:508)
    d_row = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    mask = (d_row <= row_tol[None, :]) & (disp >= -1.0) & (disp <= float(max_disp))
    # similar octaves (reference checks levels within +-1 implicitly via rows)
    mask &= jnp.abs(octave_l[:, None] - octave_r[None, :]) <= 1
    mask &= valid_l[:, None] & valid_r[None, :]

    dmat = D.masked_hamming_matrix(desc_l, desc_r, extra_mask=mask)
    idx_r, dist, desc_ok = D.best_match(dmat, max_dist=max_hamming)
    u_r0 = xy_r[jnp.clip(idx_r, 0), 0]

    # 2. SAD subpixel refinement around the descriptor match.
    xl = jnp.round(xy_l[:, 0]).astype(jnp.int32)
    yl = jnp.round(xy_l[:, 1]).astype(jnp.int32)
    xr = jnp.round(u_r0).astype(jnp.int32)
    K = xy_l.shape[0]
    left_patch = _gather_patch_rows(left_img, yl, xl, PATCH_W, jnp.zeros((K, 1), jnp.int32))
    shifts = jnp.arange(-SLIDE_R, SLIDE_R + 1)
    right_patches = _gather_patch_rows(
        right_img, yl, xr, PATCH_W, jnp.broadcast_to(shifts[None, :], (K, 2 * SLIDE_R + 1))
    )
    sad = jnp.sum(jnp.abs(right_patches - left_patch), axis=-1)  # [K, 11]
    best = jnp.argmin(sad, axis=-1)
    best_in_range = jnp.clip(best, 1, 2 * SLIDE_R - 1)
    s0 = jnp.take_along_axis(sad, (best_in_range - 1)[:, None], 1)[:, 0]
    s1 = jnp.take_along_axis(sad, best_in_range[:, None], 1)[:, 0]
    s2 = jnp.take_along_axis(sad, (best_in_range + 1)[:, None], 1)[:, 0]
    denom = s0 + s2 - 2.0 * s1
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (s0 - s2) / jnp.maximum(denom, 1e-6), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    # The SAD slide matched patches centered at integer round(x_l); shift the
    # result by the left keypoint's fractional part so the disparity refers
    # to the FLOAT left coordinate used as the measurement elsewhere
    # (assumes locally smooth disparity, true at patch scale).
    frac_l = xy_l[:, 0] - xl.astype(jnp.float32)
    u_right = (
        xr.astype(jnp.float32)
        + (best_in_range - SLIDE_R).astype(jnp.float32)
        + delta
        + frac_l
    )

    disparity = xy_l[:, 0] - u_right
    ok = desc_ok & (disparity > 0.1) & (disparity < float(max_disp))
    # SAD outlier cut at 1.5x median of accepted (Frame.cc:620: 1.5f*1.4f*median)
    best_sad = s1
    med = jnp.median(jnp.where(ok, best_sad, jnp.nan))
    med = jnp.where(jnp.isnan(med), jnp.inf, med)
    ok &= best_sad <= 2.1 * med + 1e-3

    depth = jnp.where(ok, bf / jnp.maximum(disparity, 0.1), 0.0)
    u_right = jnp.where(ok, u_right, -1.0)
    return u_right, depth, ok


def compute_stereo_from_rgbd(
    depth_map: jnp.ndarray,
    xy: jnp.ndarray,
    valid: jnp.ndarray,
    bf: float,
    min_depth: float = 0.05,
):
    """Synthesize (u_right, depth) from a registered depth map —
    `Frame::ComputeStereoFromRGBD` (ref: Frame.cc:647)."""
    h, w = depth_map.shape
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_map[yi, xi]
    ok = valid & (d > min_depth)
    u_right = jnp.where(ok, xy[:, 0] - bf / jnp.maximum(d, min_depth), -1.0)
    return u_right, jnp.where(ok, d, 0.0), ok
