"""Batched Horn similarity alignment + RANSAC.

Replaces `Sim3Solver` (ref: corbslam_client/src/Sim3Solver.cc: Horn 1987
closed-form from 3 correspondences, RANSAC loop `iterate` h45, fixed-scale
mode for stereo). TPU re-design: ALL RANSAC hypotheses are solved at once —
sample [H, 3] correspondence triples, vmap the closed form, count inliers
with one batched reprojection, pick the argmax. The reference's sequential
`mRansacMaxIts` loop becomes a single fixed-shape program.

The quaternion eigen-problem inside Horn (largest eigenvector of the 4x4 N
matrix) is solved with shifted power iteration — pure arithmetic instead of
a TPU-hostile eigensolver.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera as cam_mod
from ..geometry import se3

_PREC = jax.lax.Precision.HIGHEST


def horn_sim3(
    p1: jnp.ndarray, p2: jnp.ndarray, fix_scale: bool = False,
    w: jnp.ndarray | None = None,
):
    """Closed-form similarity p1 ~ s R p2 + t from matched sets [..., K, 3].

    Horn's quaternion method (the same construction as Sim3Solver::ComputeSim3,
    Sim3Solver.cc h56). Batched over leading dims. `w` [..., K] optionally
    weights/masks correspondences (inlier refit after RANSAC — the role of
    the reference's final Sim3 refinement over the consensus set).
    """
    if w is None:
        w = jnp.ones(p1.shape[:-1], p1.dtype)
    wn = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    c1 = jnp.sum(p1 * wn[..., None], axis=-2, keepdims=True)
    c2 = jnp.sum(p2 * wn[..., None], axis=-2, keepdims=True)
    q1 = (p1 - c1) * jnp.sqrt(wn)[..., None]
    q2 = (p2 - c2) * jnp.sqrt(wn)[..., None]
    M = jnp.einsum("...ki,...kj->...ij", q2, q1, precision=_PREC)  # [3,3]
    # 4x4 symmetric N matrix
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    # Largest eigenvector via shifted power iteration. The shift must make
    # N + shift*I PSD but stay TIGHT: convergence goes like
    # ((l2+s)/(l1+s))^k, so an oversized shift kills the eigengap. Use the
    # Gershgorin lower bound on lambda_min.
    diag = jnp.einsum("...ii->...i", N)
    radius = jnp.sum(jnp.abs(N), axis=-1) - jnp.abs(diag)
    gersh_min = jnp.min(diag - radius, axis=-1)
    shift = jnp.maximum(-gersh_min, 0.0)[..., None, None]
    Ns = N + shift * jnp.broadcast_to(jnp.eye(4), N.shape)
    v = jnp.ones(N.shape[:-1], N.dtype)

    def body(v, _):
        v = jnp.einsum("...ij,...j->...i", Ns, v, precision=_PREC)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return v, None

    v, _ = jax.lax.scan(body, v, None, length=100)
    # q = (w, x, y, z) rotating p2 into p1
    R = se3.R_from_quat(v)

    q2r = jnp.einsum("...ij,...kj->...ki", R, q2, precision=_PREC)
    if fix_scale:
        s = jnp.ones(p1.shape[:-2], p1.dtype)
    else:
        num = jnp.sum(q1 * q2r, axis=(-1, -2))
        den = jnp.sum(q2r * q2r, axis=(-1, -2))
        s = num / jnp.maximum(den, 1e-12)
    t = (c1[..., 0, :] - s[..., None] * jnp.einsum(
        "...ij,...j->...i", R, c2[..., 0, :], precision=_PREC
    ))
    return R, t, s


class Sim3RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray        # found a model above threshold


@partial(jax.jit, static_argnames=("cam1", "cam2", "n_hyp", "fix_scale"))
def solve_sim3_ransac(
    cam1: cam_mod.Intrinsics,
    cam2: cam_mod.Intrinsics,
    p1_cam: jnp.ndarray,      # [N, 3] points in camera-1 frame
    p2_cam: jnp.ndarray,      # [N, 3] matched points in camera-2 frame
    valid: jnp.ndarray,       # [N]
    sigma2_1: jnp.ndarray,    # [N] per-match pixel noise (octave sigma^2), img 1
    sigma2_2: jnp.ndarray,    # [N]
    key: jnp.ndarray,
    n_hyp: int = 128,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3RansacResult:
    """Full RANSAC in one program. Inlier test mirrors Sim3Solver::CheckInliers
    (Sim3Solver.cc:~200): project each point into BOTH cameras with the
    candidate S12 / S21 and gate reprojection error at 9.21 * sigma2."""
    N = p1_cam.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 3), p=probs)
    tri1 = p1_cam[idx]  # [H, 3, 3]
    tri2 = p2_cam[idx]
    R, t, s = horn_sim3(tri1, tri2, fix_scale)  # [H, ...]

    # Inlier check per hypothesis: err1 = |proj1(s R p2 + t) - proj1(p1)|
    p2_in1 = s[:, None, None] * jnp.einsum(
        "hij,nj->hni", R, p2_cam, precision=_PREC
    ) + t[:, None, :]
    Rinv = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / jnp.maximum(s, 1e-12)
    diff = p1_cam[None, :, :] - t[:, None, :]  # [H, N, 3]
    p1_in2 = s_inv[:, None, None] * jnp.einsum(
        "hij,hnj->hni", Rinv, diff, precision=_PREC
    )
    uv1_obs = cam_mod.project(cam1, p1_cam)
    uv2_obs = cam_mod.project(cam2, p2_cam)
    e1 = jnp.sum((cam_mod.project(cam1, p2_in1) - uv1_obs[None]) ** 2, axis=-1)
    e2 = jnp.sum((cam_mod.project(cam2, p1_in2) - uv2_obs[None]) ** 2, axis=-1)
    inl = (e1 < 9.21 * sigma2_1[None]) & (e2 < 9.21 * sigma2_2[None]) & valid[None]
    inl &= (p2_in1[..., 2] > 0) & (p1_in2[..., 2] > 0)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    n_in = counts[best]
    return Sim3RansacResult(
        R=R[best], t=t[best], s=s[best],
        inliers=inl[best], n_inliers=n_in, ok=n_in >= min_inliers,
    )
