"""Keypoint orientation (intensity centroid) + rotated BRIEF descriptors.

Replaces `IC_Angle` (ref: corbslam_client/src/ORBextractor.cc:77 — circular
patch moments m01/m10 over a radius-15 patch) and `computeOrbDescriptor`
(ORBextractor.cc:108 — 256 learned point pairs rotated by the keypoint
angle). The sampling pattern here is NOT the reference's learned
`bit_pattern_31_` table; it is an independently generated isotropic Gaussian
pair pattern (original-BRIEF style, Calonder et al. 2010), fixed by seed at
import. Descriptors are self-consistent within this framework, which is all
the pipeline requires.

Batched over keypoints: patch reads become one XLA gather of
[K, n_samples] pixels — no per-keypoint loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15  # orientation patch, matches reference HALF_PATCH_SIZE
BRIEF_RADIUS = 13  # pattern coords within +/-13 so rotations stay in 31x31... (see pad)
N_BITS = 256


def _circular_offsets(radius: int) -> np.ndarray:
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    mask = ys * ys + xs * xs <= radius * radius
    return np.stack([ys[mask], xs[mask]], axis=-1).astype(np.int32)  # [P, 2]


_ORIENT_OFFS = _circular_offsets(PATCH_RADIUS)


def _make_pattern(seed: int = 42) -> np.ndarray:
    """[256, 2, 2] int32 (pair, point, (y, x)) ~ N(0, (r/2.5)^2), clipped."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, BRIEF_RADIUS / 2.5, size=(N_BITS, 2, 2))
    return np.clip(np.round(pts), -BRIEF_RADIUS, BRIEF_RADIUS).astype(np.int32)


BRIEF_PATTERN = _make_pattern()


def _gather_pixels(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Clamped 2-D gather: img [H, W], ys/xs [...]-> [...] f32."""
    h, w = img.shape
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return img[ys, xs]


def compute_orientation(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle for keypoints.

    img [H, W] f32, xy [K, 2] f32 (x, y) -> angle [K] radians.
    theta = atan2(m01, m10) over the circular radius-15 patch (IC_Angle).
    """
    kx = jnp.round(xy[:, 0]).astype(jnp.int32)
    ky = jnp.round(xy[:, 1]).astype(jnp.int32)
    offs = jnp.asarray(_ORIENT_OFFS)  # [P, 2]
    ys = ky[:, None] + offs[None, :, 0]
    xs = kx[:, None] + offs[None, :, 1]
    vals = _gather_pixels(img, ys, xs)  # [K, P]
    m01 = jnp.sum(vals * offs[None, :, 0].astype(jnp.float32), axis=1)
    m10 = jnp.sum(vals * offs[None, :, 1].astype(jnp.float32), axis=1)
    return jnp.arctan2(m01, m10)


def compute_brief(
    img: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Rotated BRIEF-256. img (blurred) [H, W], xy [K, 2], angle [K] ->
    packed descriptors uint8 [K, 32].

    Pattern points are rotated by the keypoint angle and rounded — the
    steered-BRIEF construction of computeOrbDescriptor (ORBextractor.cc:108).
    """
    pat = jnp.asarray(BRIEF_PATTERN, jnp.float32)  # [256, 2, 2] (y, x)
    c, s = jnp.cos(angle), jnp.sin(angle)  # [K]
    py, px = pat[..., 0], pat[..., 1]  # [256, 2]
    # Rotate: x' = x cos - y sin ; y' = x sin + y cos
    rx = px[None] * c[:, None, None] - py[None] * s[:, None, None]
    ry = px[None] * s[:, None, None] + py[None] * c[:, None, None]
    kx = jnp.round(xy[:, 0])[:, None, None]
    ky = jnp.round(xy[:, 1])[:, None, None]
    ys = jnp.round(ky + ry).astype(jnp.int32)  # [K, 256, 2]
    xs = jnp.round(kx + rx).astype(jnp.int32)
    vals = _gather_pixels(img, ys, xs)  # [K, 256, 2]
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # [K, 256]
    from .descriptors import pack_bits

    return pack_bits(bits)
