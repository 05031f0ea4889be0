"""Covisibility graph, derived on device from the observation table.

Replaces the reference's incrementally-maintained covisibility structures
(`KeyFrame::UpdateConnections`, `GetBestCovisibilityKeyFrames`,
`GetVectorCovisibleKeyFrames` — ref: corbslam_client/src/KeyFrame.cc:266-377
plus the spanning-tree bookkeeping): here covisibility weights are always
RECOMPUTED from `kf.mp_idx` with segment reductions / binary matmuls, so
they can never drift out of sync with the observations (a reference failure
mode guarded by mutexes).

Two granularities:
  - `covis_weights_single(m, q)`: [N] weights against one keyframe — the
    per-frame tracking / local-mapping query (O(N*F) gathers).
  - `obs_matrix` + `covis_matrix`: the full [N, N] graph as one int8 MXU
    matmul B B^T over the [N, M] observation incidence — used by the
    episodic loop-closing / pose-graph programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mapstate import MapState


def point_mask_of_kf(m: MapState, q) -> jnp.ndarray:
    """[M] bool: map points observed by keyframe row q."""
    idx = m.kf.mp_idx[q]
    ok = (idx >= 0) & m.kf.fvalid[q]
    mask = jnp.zeros(m.mp.capacity, bool)
    return mask.at[jnp.where(ok, idx, 0)].max(ok)


def covis_weights_single(m: MapState, q) -> jnp.ndarray:
    """[N] number of map points shared with keyframe q (self included)."""
    pmask = point_mask_of_kf(m, q)
    idx = m.kf.mp_idx
    contrib = (idx >= 0) & m.kf.fvalid & m.kf.valid[:, None]
    shared = jnp.where(contrib, pmask[jnp.clip(idx, 0)], False)
    return jnp.sum(shared, axis=1).astype(jnp.int32)


@jax.jit
def covis_weights_matrix_rows(m: MapState, rows: jnp.ndarray) -> jnp.ndarray:
    """[K, N] covisibility weights of the given keyframe rows against all
    keyframes (vmapped covis_weights_single — used by loop closing's
    consistency groups, LoopClosing.cc:150-231)."""
    return jax.vmap(lambda q: covis_weights_single(m, q))(rows)


def obs_matrix(m: MapState, dtype=jnp.int8) -> jnp.ndarray:
    """[N, M] binary incidence: keyframe n observes point p."""
    N, M = m.kf.capacity, m.mp.capacity
    idx = m.kf.mp_idx
    contrib = (idx >= 0) & m.kf.fvalid & m.kf.valid[:, None]
    B = jnp.zeros((N, M), dtype)
    rows = jnp.broadcast_to(jnp.arange(N)[:, None], idx.shape)
    return B.at[rows.reshape(-1), jnp.where(contrib, idx, 0).reshape(-1)].max(
        contrib.reshape(-1).astype(dtype)
    )


def covis_matrix(m: MapState) -> jnp.ndarray:
    """[N, N] covisibility weights (shared-point counts); diagonal = own
    point counts. One int8 MXU matmul."""
    B = obs_matrix(m)
    W = jax.lax.dot_general(
        B, B, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return W


def top_covisible(weights: jnp.ndarray, q, k: int, min_weight: int = 15):
    """Top-k covisible keyframe rows of q by weight (excluding q itself).

    Mirrors GetBestCovisibilityKeyFrames / the >=15-shared-points threshold
    (KeyFrame.cc:276). Returns (rows [k], ok [k])."""
    w = weights.at[q].set(0)
    vals, rows = jax.lax.top_k(w, k)
    return rows, vals >= min_weight


def local_map_mask(m: MapState, kf_rows: jnp.ndarray, kf_ok: jnp.ndarray) -> jnp.ndarray:
    """[M] mask of map points observed by any of the given keyframes —
    the tracking local map (UpdateLocalPoints, Tracking.cc:1230)."""
    idx = m.kf.mp_idx[kf_rows]  # [K, F]
    ok = (idx >= 0) & m.kf.fvalid[kf_rows] & kf_ok[:, None]
    mask = jnp.zeros(m.mp.capacity, bool)
    return mask.at[jnp.where(ok, idx, 0)].max(ok) & m.mp.valid


def compact_indices(mask: jnp.ndarray, k: int, newest_first: bool = True):
    """Fixed-size compaction: rows of up to k True entries of `mask`.

    Returns (rows [k] i32, ok [k] bool). When the mask has more than k
    entries, `newest_first` keeps the HIGHEST row indices — allocation is a
    monotone cursor, so high rows are the most recently created map points,
    which are the ones the current camera can actually see. (Keeping the
    oldest rows silently filled tracking's local map with stale points as
    the map grew — a capacity-truncation failure mode the reference's
    unbounded std::set maps cannot have, SURVEY.md §5.7.)
    """
    n = mask.shape[0]
    row = jnp.arange(n, dtype=jnp.int32)
    key = mask.astype(jnp.int32) * (n + 1) + (row if newest_first else n - row)
    _, rows = jax.lax.top_k(key, k)
    ok = mask[rows]
    return rows.astype(jnp.int32), ok
