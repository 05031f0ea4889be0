"""Synthetic imagery + scenes for tests and benchmarks.

The reference validates on KITTI/TUM/EuRoC replays (SURVEY.md §4); this
container has no datasets and zero egress, so the framework ships a
procedural substitute: band-limited random textures, homography/projective
warps, and a textured-plane 3-D world that renders consistent stereo pairs
along a camera trajectory — enough signal for FAST/BRIEF/matching/tracking
to behave like they do on real imagery, with exact ground truth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera as cam_mod
from ..geometry import se3


def random_texture(h: int, w: int, seed: int = 0, octaves: int = 4) -> np.ndarray:
    """Multi-octave smoothed noise in [0, 255], strong local contrast."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for o in range(octaves):
        sh, sw = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        layer = rng.normal(size=(sh, sw)).astype(np.float32)
        layer = np.asarray(jax.image.resize(jnp.asarray(layer), (h, w), "bilinear"))
        img += layer * (2.0 ** -o)
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return (img * 255.0).astype(np.float32)


def bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation with clamping. img [H, W]; ys/xs any shape."""
    h, w = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    flat = img.reshape(-1)  # flat 1-D gathers are the fast TPU lowering
    v00 = flat[y0 * w + x0]
    v01 = flat[y0 * w + x1]
    v10 = flat[y1 * w + x0]
    v11 = flat[y1 * w + x1]
    return (
        v00 * (1 - dy) * (1 - dx)
        + v01 * (1 - dy) * dx
        + v10 * dy * (1 - dx)
        + v11 * dy * dx
    )


def warp_homography(img: jnp.ndarray, H: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Warp by 3x3 homography mapping OUTPUT pixel -> SOURCE pixel."""
    oh, ow = out_hw
    yy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    ones = jnp.ones_like(xx)
    pts = jnp.stack([xx, yy, ones], axis=0).reshape(3, -1)
    src = H @ pts
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    return bilinear_sample(img, sy, sx).reshape(oh, ow)


class PlanarWorld:
    """A textured ground-like plane rendered from arbitrary camera poses.

    Plane: z = plane_dist in some world frame tilt; texture coordinates are a
    scaled orthographic chart of the plane. Rendering a view = homography
    warp of the master texture, so stereo pairs and sequences are exactly
    geometrically consistent (with known ground-truth poses and depth).
    """

    def __init__(
        self,
        cam: cam_mod.Intrinsics,
        texture_size: int = 4096,
        plane_dist: float = 12.0,
        texture_scale: float = 50.0,  # pixels per world unit on the plane
        seed: int = 0,
    ):
        self.cam = cam
        self.plane_dist = float(plane_dist)
        self.texture_scale = float(texture_scale)
        self.tex = jnp.asarray(random_texture(texture_size, texture_size, seed))
        self.tex_size = texture_size

    def _plane_to_tex(self):
        """World plane point (x, y, plane_dist) -> texture pixel (tx, ty)."""
        s = self.texture_scale
        c = self.tex_size / 2.0
        return s, c

    def render(self, Tcw: jnp.ndarray) -> jnp.ndarray:
        """Render the view from camera pose Tcw (world->cam). [H, W] f32."""
        cam = self.cam
        K = cam.K
        # Output pixel -> ray -> intersect plane z=d in WORLD frame.
        # p_cam = z * K^-1 u ; p_world = Rwc p_cam + twc.
        Twc = se3.inverse(Tcw)
        R = se3.rotation(Twc)
        t = se3.translation(Twc)
        Kinv = jnp.linalg.inv(K)
        h, w = cam.height, cam.width
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        ones = jnp.ones_like(xx)
        rays = jnp.einsum("ij,jhw->ihw", Kinv, jnp.stack([xx, yy, ones]))
        dirs = jnp.einsum("ij,jhw->ihw", R, rays)  # world-frame directions
        # Intersect with plane z = plane_dist: t*dz + tz = d
        denom = dirs[2]
        lam = (self.plane_dist - t[2]) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        px = t[0] + lam * dirs[0]
        py = t[1] + lam * dirs[1]
        s, c = self._plane_to_tex()
        tx = px * s + c
        ty = py * s + c
        img = bilinear_sample(self.tex, ty, tx)
        # Rays that miss the plane (lam <= 0) render as flat gray.
        return jnp.where(lam > 0, img, 128.0)

    def render_stereo(self, Tcw: jnp.ndarray):
        """(left, right) pair; right camera offset by baseline along +x."""
        b = self.cam.baseline
        T_rl = se3.from_Rt(jnp.eye(3), jnp.array([-b, 0.0, 0.0]))
        return self.render(Tcw), self.render(se3.compose(T_rl, Tcw))

    def depth(self, Tcw: jnp.ndarray) -> jnp.ndarray:
        """Ground-truth depth map for a view (for RGB-D simulation)."""
        cam = self.cam
        Twc = se3.inverse(Tcw)
        R = se3.rotation(Twc)
        t = se3.translation(Twc)
        Kinv = jnp.linalg.inv(cam.K)
        h, w = cam.height, cam.width
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        ones = jnp.ones_like(xx)
        rays = jnp.einsum("ij,jhw->ihw", Kinv, jnp.stack([xx, yy, ones]))
        dirs = jnp.einsum("ij,jhw->ihw", R, rays)
        denom = dirs[2]
        lam = (self.plane_dist - t[2]) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        # depth along camera z = lam * (R^T dirs)_z ... by construction
        # p_cam = lam * rays (camera frame), so z = lam * rays_z = lam.
        return jnp.where(lam > 0, lam * rays[2], 0.0)
