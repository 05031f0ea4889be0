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


class MultiPlaneWorld:
    """Non-planar 3-D validation world: N textured planes composited by
    z-buffer, with optional per-frame photometric noise.

    Addresses the planar-world degeneracy (a single plane is degenerate for
    F-matrix init and trivially texture-rich): real 3-D structure, depth
    discontinuities, and a room layout that supports closed-loop
    trajectories. Plane i is n_i . p = d_i with an orthonormal in-plane
    chart (u_i, v_i) mapping world points to its own texture.
    """

    def __init__(self, cam: cam_mod.Intrinsics, planes, texture_size: int = 2048,
                 texture_scale: float = 50.0, noise_std: float = 0.0,
                 seed: int = 0):
        """planes: list of (normal [3], offset d, chart_origin [3])."""
        self.cam = cam
        self.texture_scale = float(texture_scale)
        self.noise_std = float(noise_std)
        self.tex_size = texture_size
        n_list, d_list, o_list, u_list, v_list, tex = [], [], [], [], [], []
        for i, (n, d, o) in enumerate(planes):
            n = np.asarray(n, np.float32)
            n = n / np.linalg.norm(n)
            a = np.array([1.0, 0.0, 0.0], np.float32)
            if abs(n[0]) > 0.9:
                a = np.array([0.0, 1.0, 0.0], np.float32)
            u = np.cross(n, a); u /= np.linalg.norm(u)
            v = np.cross(n, u)
            n_list.append(n); d_list.append(float(d))
            o_list.append(np.asarray(o, np.float32))
            u_list.append(u); v_list.append(v)
            tex.append(random_texture(texture_size, texture_size,
                                      seed * 131 + i))
        self.n = jnp.asarray(np.stack(n_list))        # [P, 3]
        self.d = jnp.asarray(np.asarray(d_list))      # [P]
        self.o = jnp.asarray(np.stack(o_list))        # [P, 3]
        self.u = jnp.asarray(np.stack(u_list))        # [P, 3]
        self.v = jnp.asarray(np.stack(v_list))        # [P, 3]
        self.tex = jnp.asarray(np.stack(tex))         # [P, S, S]
        self._noise_seed = seed

    @staticmethod
    def room(cam: cam_mod.Intrinsics, half: float = 14.0, height: float = 3.0,
             noise_std: float = 0.0, seed: int = 0,
             texture_scale: float = 60.0) -> "MultiPlaneWorld":
        """A closed box room (4 walls + floor + ceiling): loop trajectories
        that circle inside it re-observe the start view — the loop-closure
        validation scene."""
        h = half
        planes = [
            ([0.0, 0.0, -1.0], -h, [0.0, 0.0, h]),    # front wall  z=+h
            ([0.0, 0.0, 1.0], -h, [0.0, 0.0, -h]),    # back wall   z=-h
            ([1.0, 0.0, 0.0], -h, [-h, 0.0, 0.0]),    # left wall   x=-h
            ([-1.0, 0.0, 0.0], -h, [h, 0.0, 0.0]),    # right wall  x=+h
            ([0.0, -1.0, 0.0], -height, [0.0, height, 0.0]),   # floor y=+height
            ([0.0, 1.0, 0.0], -height, [0.0, -height, 0.0]),   # ceiling
        ]
        return MultiPlaneWorld(cam, planes, noise_std=noise_std, seed=seed,
                               texture_scale=texture_scale)

    def _render_depth(self, Tcw: jnp.ndarray):
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
        dirs = jnp.einsum("ij,jhw->ihw", R, rays)  # [3, H, W] world dirs
        # Per-plane ray parameter: lam_i = (d_i - n_i.t) / (n_i.dir).
        ndotdir = jnp.einsum("pi,ihw->phw", self.n, dirs)
        ndott = self.n @ t  # [P]
        lam = (self.d - ndott)[:, None, None] / jnp.where(
            jnp.abs(ndotdir) < 1e-6, 1e-6, ndotdir)
        lam = jnp.where(lam > 0.05, lam, jnp.inf)  # behind-camera cull
        best = jnp.argmin(lam, axis=0)  # [H, W] winning plane (z-buffer)
        lam_b = jnp.min(lam, axis=0)
        hit = jnp.isfinite(lam_b)
        lam_b = jnp.where(hit, lam_b, 0.0)
        p = t[:, None, None] + lam_b[None] * dirs  # [3, H, W] world point
        # Per-plane texture coords, then select the winning plane's sample.
        s = self.texture_scale
        c = self.tex_size / 2.0
        rel = p[None] - self.o[:, :, None, None]   # [P, 3, H, W]
        tx = jnp.einsum("pi,pihw->phw", self.u, rel) * s + c
        ty = jnp.einsum("pi,pihw->phw", self.v, rel) * s + c
        samp = jax.vmap(bilinear_sample)(self.tex, ty, tx)  # [P, H, W]
        one_hot = jax.nn.one_hot(best, self.n.shape[0], axis=0)
        img = jnp.sum(samp * one_hot, axis=0)
        img = jnp.where(hit, img, 128.0)
        depth = jnp.where(hit, lam_b * rays[2], 0.0)
        return img, depth

    def _add_noise(self, img: jnp.ndarray, frame_key) -> jnp.ndarray:
        if self.noise_std <= 0.0 or frame_key is None:
            return img
        noise = jax.random.normal(frame_key, img.shape) * self.noise_std
        return jnp.clip(img + noise, 0.0, 255.0)

    def render(self, Tcw: jnp.ndarray, frame: int = 0) -> jnp.ndarray:
        img, _ = self._render_depth(Tcw)
        key = (jax.random.PRNGKey(self._noise_seed * 977 + frame * 2)
               if self.noise_std > 0 else None)
        return self._add_noise(img, key)

    def render_stereo(self, Tcw: jnp.ndarray, frame: int = 0):
        b = self.cam.baseline
        T_rl = se3.from_Rt(jnp.eye(3), jnp.array([-b, 0.0, 0.0]))
        l, _ = self._render_depth(Tcw)
        r, _ = self._render_depth(se3.compose(T_rl, Tcw))
        if self.noise_std > 0:
            k = jax.random.PRNGKey(self._noise_seed * 977 + frame * 2)
            kl, kr = jax.random.split(k)
            l, r = self._add_noise(l, kl), self._add_noise(r, kr)
        return l, r

    def depth(self, Tcw: jnp.ndarray) -> jnp.ndarray:
        _, d = self._render_depth(Tcw)
        return d
