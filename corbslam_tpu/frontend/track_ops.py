"""Jitted tracking programs: motion-model tracking, local-map tracking,
keyframe insertion with new-point spawning.

These are the device halves of the reference's `Tracking` thread (ref:
corbslam_client/src/Tracking.cc): `TrackWithMotionModel` (:886),
`TrackReferenceKeyFrame` (:775), `TrackLocalMap` + `SearchLocalPoints`
(:951, :1168), `CreateNewKeyFrame` (:1083). The host state machine
(tracking.py) sequences them; each is one fixed-shape XLA program over the
map SoA.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera as cam_mod
from ..geometry import se3
from ..mapstate import covisibility as covis
from ..mapstate import mapstate as ms
from ..matching import matcher
from ..optim import pose_opt
from .frame import FrameData

NO_MP = ms.NO_MP


def _pose_opt_from_matches(cam, T_init, frame: FrameData, mp_pos, match_idx):
    """Run motion-only LM from per-feature map-point matches."""
    has = match_idx >= 0
    X = mp_pos[jnp.clip(match_idx, 0)]
    obs = jnp.stack([frame.xy[:, 0], frame.xy[:, 1], frame.uright], axis=-1)
    is_stereo = frame.uright > 0
    inv_sigma2 = 1.0 / (1.2 ** (2.0 * frame.octave.astype(jnp.float32)))
    res = pose_opt.optimize_pose(
        cam, T_init, X, obs, inv_sigma2, is_stereo, has & frame.fvalid
    )
    kept = jnp.where(res.inliers, match_idx, NO_MP)
    return res.Tcw, kept, res.n_inliers


@partial(jax.jit, static_argnames=("cam",))
def track_motion_model(
    cam: cam_mod.Intrinsics,
    mp_pos: jnp.ndarray,        # [M, 3] current map-point positions
    prev: FrameData,
    cur: FrameData,
    T_pred: jnp.ndarray,        # velocity-predicted pose
    scale_factors: jnp.ndarray,
    radius: float = 15.0,
):
    """TrackWithMotionModel: project last frame's points at the predicted
    pose, match, pose-optimize. Returns (Tcw, mp_idx [F], n_inliers)."""
    prev_has = prev.mp_idx >= 0
    prev_pos = mp_pos[jnp.clip(prev.mp_idx, 0)]
    res = matcher.search_frame_frame(
        cam, T_pred,
        prev_pos, prev_has & prev.fvalid,
        prev.xy, prev.octave, prev.desc, prev.angle,
        cur.xy, cur.octave, cur.desc, cur.angle, cur.fvalid,
        scale_factors, radius=radius, max_dist=100,
    )
    # map matched prev-feature -> its map point
    match_mp = jnp.where(res.idx >= 0, prev.mp_idx[jnp.clip(res.idx, 0)], NO_MP)
    return _pose_opt_from_matches(cam, T_pred, cur, mp_pos, match_mp)


@partial(jax.jit, static_argnames=("cam",))
def track_reference_kf(
    cam: cam_mod.Intrinsics,
    m: ms.MapState,
    ref_kf,
    cur: FrameData,
    T_init: jnp.ndarray,
):
    """TrackReferenceKeyFrame: global descriptor match against one keyframe
    (the reference uses SearchByBoW; dense Hamming subsumes it)."""
    kf_desc = m.kf.desc[ref_kf]
    kf_valid = m.kf.fvalid[ref_kf] & (m.kf.mp_idx[ref_kf] >= 0)
    res = matcher.search_by_descriptor(
        cur.desc, cur.fvalid, kf_desc, kf_valid, max_dist=50, ratio=0.7
    )
    match_mp = jnp.where(
        res.idx >= 0, m.kf.mp_idx[ref_kf][jnp.clip(res.idx, 0)], NO_MP
    )
    return _pose_opt_from_matches(cam, T_init, cur, m.mp.pos, match_mp)


class LocalTrackResult(NamedTuple):
    Tcw: jnp.ndarray
    mp_idx: jnp.ndarray
    n_inliers: jnp.ndarray
    ref_kf: jnp.ndarray
    local_kf_rows: jnp.ndarray
    local_kf_ok: jnp.ndarray
    visible_rows: jnp.ndarray   # [L] compacted local map rows
    visible_mask: jnp.ndarray   # [L] which were frustum-visible
    found_rows_mask: jnp.ndarray  # [L] which got matched


@partial(jax.jit, static_argnames=("cam", "cfg"))
def track_local_map(
    cam: cam_mod.Intrinsics,
    m: ms.MapState,
    cur: FrameData,
    T_init: jnp.ndarray,
    mp_idx_in: jnp.ndarray,
    cfg: SlamConfig,
):
    """TrackLocalMap: pick local keyframes by shared observations with the
    current matches, project their map points, widen matches, re-optimize.

    (ref: Tracking.cc:951 TrackLocalMap, :1259 UpdateLocalKeyFrames, :1230
    UpdateLocalPoints, :1168 SearchLocalPoints)
    """
    scales = jnp.asarray(cfg.orb.scales(), jnp.float32)
    K1 = cfg.capacity.local_window_kfs
    L = cfg.capacity.local_window_mps

    # 1. Keyframes sharing map points with the current frame.
    cur_mask = jnp.zeros(m.mp.capacity, bool)
    has = mp_idx_in >= 0
    cur_mask = cur_mask.at[jnp.where(has, mp_idx_in, 0)].max(has)
    idx = m.kf.mp_idx
    contrib = (idx >= 0) & m.kf.fvalid & m.kf.valid[:, None]
    share = jnp.where(contrib, cur_mask[jnp.clip(idx, 0)], False)
    kf_weight = jnp.sum(share, axis=1).astype(jnp.int32)  # [N]
    ref_kf = jnp.argmax(kf_weight)
    local_vals, local_rows = jax.lax.top_k(kf_weight, K1)
    local_ok = local_vals > 0

    # 2. Local map points (observed by local KFs), excluding current matches.
    # Frustum-filter BEFORE compaction so the fixed-size local buffer holds
    # only points the camera can currently see (SearchLocalPoints does the
    # same isInFrustum gate before matching, Tracking.cc:1189-1200).
    pmask = covis.local_map_mask(m, local_rows, local_ok)
    pmask &= ~cur_mask
    vis_all, _, _, _, _ = cam_mod.in_frustum(
        cam, T_init, m.mp.pos,
        m.mp.min_dist * 0.5, m.mp.max_dist * 2.0, m.mp.normal,
        view_cos_limit=-1.0,
    )
    pmask &= vis_all
    rows, rows_ok = covis.compact_indices(pmask, L)

    # 3. Project + match the compacted local points.
    res, visible = matcher.search_by_projection_points(
        cam, T_init,
        m.mp.pos[rows], m.mp.desc[rows], rows_ok,
        m.mp.min_dist[rows], m.mp.max_dist[rows], m.mp.normal[rows],
        cur.xy, cur.octave, cur.desc, cur.fvalid & ~has,
        scales, cfg.orb.scale_factor,
        radius=cfg.matcher.search_radius_motion / 4.0,
        max_dist=cfg.matcher.th_high,
        ratio=0.8,
        # No octave gate here: the dense matcher computes the full distance
        # matrix anyway (the reference gates octaves to cut CPU candidates,
        # ORBmatcher.cc SearchByProjection), and the radius window + mutual
        # best + ratio test disambiguate. Measured on the planar E2E sweep:
        # gate off 0.025 ATE vs 0.062-0.090 for every gated window.
        octave_slack=16, octave_slack_up=16,
    )
    new_mp = jnp.where(res.idx >= 0, rows[jnp.clip(res.idx, 0)], NO_MP)
    merged = jnp.where(has, mp_idx_in, new_mp)

    # 4. Final pose optimization over merged matches.
    Tcw, kept, n_inliers = _pose_opt_from_matches(cam, T_init, cur, m.mp.pos, merged)

    found_mask = jnp.zeros(m.mp.capacity, bool)
    kh = kept >= 0
    found_mask = found_mask.at[jnp.where(kh, kept, 0)].max(kh)
    return LocalTrackResult(
        Tcw, kept, n_inliers, ref_kf, local_rows, local_ok,
        rows, visible & rows_ok, found_mask[rows],
    )


@partial(jax.jit, static_argnames=("cam", "cfg", "client"), donate_argnums=(1,))
def insert_keyframe_with_points(
    cam: cam_mod.Intrinsics,
    m: ms.MapState,
    cur: FrameData,
    frame_id,
    timestamp,
    cfg: SlamConfig,
    client: int = 0,
):
    """CreateNewKeyFrame (ref: Tracking.cc:1083): insert the frame as a
    keyframe and spawn map points for close stereo features without a match
    (Tracking.cc:1113-1155: depth < ThDepth, sorted, at least 100).
    Returns (map, kf_row)."""
    close = (cur.depth > 0.01) & (cur.depth < cfg.tracking.th_depth * cam.baseline)
    spawn = close & cur.fvalid & (cur.mp_idx < 0)
    p_cam = cam_mod.backproject(cam, cur.xy, cur.depth)
    Twc = se3.inverse(cur.Tcw)
    pos_w = se3.transform(Twc, p_cam)
    cam_center = se3.translation(Twc)
    d = pos_w - cam_center
    dist = jnp.linalg.norm(d, axis=-1)
    normal = d / jnp.maximum(dist[:, None], 1e-9)
    level_scale = jnp.asarray(cfg.orb.scales(), jnp.float32)[cur.octave]
    max_dist = dist * level_scale
    min_dist = max_dist / (cfg.orb.scale_factor ** (cfg.orb.n_levels - 1))

    kf_row = m.n_kf
    m2, rows = ms.add_map_points(
        m, pos_w, cur.desc, normal, min_dist, max_dist,
        ref_kf=kf_row, create=spawn, client=client,
    )
    mp_idx = jnp.where(spawn, rows, cur.mp_idx)
    m3, kf_row = ms.insert_keyframe(
        m2, cur.Tcw, cur.xy, cur.octave, cur.angle, cur.desc,
        cur.uright, cur.depth, cur.fvalid, mp_idx,
        frame_id, timestamp, client=client,
    )
    return m3, kf_row, mp_idx


@partial(jax.jit, donate_argnums=(0,))
def update_tracking_stats(
    m: ms.MapState,
    visible_rows: jnp.ndarray,
    visible_mask: jnp.ndarray,
    found_rows_mask: jnp.ndarray,
):
    """IncreaseVisible / IncreaseFound counters driving point culling
    (ref: MapPoint.cc:~300, Tracking.cc:1168-1226)."""
    nv = m.mp.n_visible.at[visible_rows].add(visible_mask.astype(jnp.int32))
    nf = m.mp.n_found.at[visible_rows].add(found_rows_mask.astype(jnp.int32))
    return m._replace(mp=m.mp._replace(n_visible=nv, n_found=nf))
