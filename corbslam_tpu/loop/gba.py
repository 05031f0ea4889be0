"""Global bundle adjustment: whole-map BA with async dispatch + abort.

Replaces the reference's detached GBA thread and its cancellation protocol
(ref: corbslam_client/src/LoopClosing.cc:584 spawn,
:413-428 mbStopGBA + mnFullBAIdx bump, :652 RunGlobalBundleAdjustment with
spanning-tree propagation :685-755; server clone GlobalOptimize.cpp:435).

TPU re-design: the whole map IS one fixed-shape BAProblem (the SoA arrays
flatten directly — no graph building), optimized by the Schur/PCG LM engine
in optim/ba.py. The LM loop is CHUNKED so the host can cancel between
device dispatches (the reference checks mbStopGBA between g2o iterations,
Optimizer.cc:76-77). Merge-back propagates the correction to keyframes and
landmarks created while BA ran — the reference walks the spanning tree;
here new rows are anchored to the last optimized keyframe / their reference
keyframe, one gather program.
"""

from __future__ import annotations

import threading
from functools import partial

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera as cam_mod
from ..geometry import se3
from ..mapstate import covisibility as covis
from ..mapstate import mapstate as ms
from ..optim import ba, ba_dense


def build_global_problem(m: ms.MapState, cfg: SlamConfig) -> ba.BAProblem:
    """Flatten the full map into a BAProblem (GlobalBundleAdjustemnt's
    all-KFs/all-points graph, Optimizer.cc:43-54). Row 0 is the gauge."""
    N, F, M = m.kf.capacity, m.kf.n_features, m.mp.capacity
    kf_idx = jnp.repeat(jnp.arange(N, dtype=jnp.int32), F)
    mp_idx = m.kf.mp_idx.reshape(-1)
    ok = (mp_idx >= 0) & m.kf.fvalid.reshape(-1) & jnp.repeat(m.kf.valid, F)
    ok &= jnp.where(mp_idx >= 0, m.mp.valid[jnp.clip(mp_idx, 0)], False)

    xy = m.kf.xy.reshape(-1, 2)
    ur = m.kf.uright.reshape(-1)
    octv = m.kf.octave.reshape(-1)
    inv_sigma2 = 1.0 / (cfg.orb.scale_factor ** (2.0 * octv.astype(jnp.float32)))

    pose_fixed = ~m.kf.valid | m.kf.fixed
    pose_fixed = pose_fixed.at[0].set(True)
    return ba.BAProblem(
        Tcw=m.kf.Tcw,
        pose_fixed=pose_fixed,
        X=m.mp.pos,
        point_fixed=~m.mp.valid | m.mp.fixed,
        obs_cam=kf_idx,
        obs_point=jnp.clip(mp_idx, 0),
        obs_uvr=jnp.concatenate([xy, ur[:, None]], axis=-1),
        obs_inv_sigma2=inv_sigma2,
        obs_stereo=ur > 0,
        obs_valid=ok,
    )


def build_global_problem_dense(
    m: ms.MapState, cfg: SlamConfig,
    n_kf_hint: int | None = None, n_mp_hint: int | None = None,
    with_pm: bool = True,
) -> ba_dense.BADense:
    """Right-sized whole-map BA problem in the tile-native plane layout:
    per-keyframe observation budget instead of the capacity-sized [N*F]
    flattening (which padded to 42.7 GB of HLO temps at flagship capacity
    and OOMed the chip). This is the production GBA path.

    `n_kf_hint`/`n_mp_hint` (host ints) additionally slice the camera /
    point axes to the used rows rounded up to 256 / 8192 (static shape
    buckets, so jit variants stay bounded) — a 768-KF map then stops
    paying for 2048 capacity rows in every gather of the LM loop. The
    point-major table's K is sized from the map's actual max observations
    per point (power-of-two bucket, cap 128) so no observation is dropped
    on normal maps."""
    if not with_pm:
        # Camera-sharded distributed path: keeps scatter + psum and
        # discards any pm table — skip building it so NO observation is
        # thinned for a structure that would be thrown away (advisor r4).
        pm_k = None
    else:
        # One episodic host sync: the per-point observation count maximum.
        # Computed UNCONDITIONALLY (advisor r4): a fixed default pm_k
        # silently dropped observations beyond it for callers without
        # hints, and the r4 loop-e2e bisect showed exactly that bias
        # bending converged GBA.
        idx = m.kf.mp_idx
        ok = (idx >= 0) & m.kf.fvalid & m.kf.valid[:, None]
        counts = jnp.zeros(m.mp.capacity + 1, jnp.int32).at[
            jnp.where(ok, idx, m.mp.capacity).reshape(-1)
        ].add(1, mode="drop")
        max_obs = int(jnp.max(counts[:-1]))
        pm_k = 8
        while pm_k < max_obs and pm_k < 128:
            pm_k *= 2
        if max_obs > 128:
            import sys
            print(f"[gba] pm_k capped at 128 but max obs/point is {max_obs};"
                  " excess observations beyond the even-stride sample are "
                  "dropped from the point-major table", file=sys.stderr)
    p = ba_dense.problem_from_map(
        m, cfg.orb.scale_factor, cfg.loop.gba_obs_per_kf, pm_k=pm_k)
    if n_kf_hint is not None:
        Cr = ba_dense.round_up(n_kf_hint, 256, m.kf.capacity)
        Pr = ba_dense.round_up(n_mp_hint or m.mp.capacity, 8192,
                               m.mp.capacity)
        p = ba_dense.slice_problem(p, Cr, Pr)
    return p


@jax.jit
def merge_gba_result(
    m: ms.MapState,
    Tcw_opt: jnp.ndarray,   # [N, 4, 4] optimized poses (snapshot rows)
    X_opt: jnp.ndarray,     # [M, 3]
    n_kf_snap,
    n_mp_snap,
) -> ms.MapState:
    """Write a finished GBA result into the CURRENT map, propagating the
    correction to rows created during the run via the spanning chain
    (LoopClosing.cc:685-755 walks the spanning tree: each un-optimized
    child moves by its PARENT's correction, Tcw_child ∘ Tcw_parent^-1 ∘
    Tcw_parent_opt). Rows are allocated in time order and parents point
    earlier, so the chain from any new row to its snapshot ancestor is
    resolved with pointer doubling; a row whose client joined entirely
    during the run has no snapshot ancestor and keeps its pose. New
    landmarks follow their reference keyframe's correction."""
    N = m.kf.capacity
    rows = jnp.arange(N, dtype=jnp.int32)
    in_snap = rows < n_kf_snap
    T_old = m.kf.Tcw

    # Right-delta per snapshot row: D[p] = T_old[p]^-1 ∘ T_opt[p].
    D = jax.vmap(lambda To, Tn: se3.compose(se3.inverse(To), Tn))(
        T_old, Tcw_opt)

    # Snapshot ancestor of every row along the per-client spanning chain.
    parent = covis.spanning_parents(m)
    anc = jnp.where(in_snap | (parent < 0), rows, parent)
    for _ in range(12):  # pointer doubling: covers chains up to 2^12 rows
        step = anc[jnp.clip(anc, 0)]
        done = in_snap[jnp.clip(anc, 0)] | (step == anc)
        anc = jnp.where(done, anc, step)
    anc_ok = in_snap[jnp.clip(anc, 0)]
    D_row = jnp.where(
        anc_ok[:, None, None], D[jnp.clip(anc, 0)],
        jnp.broadcast_to(jnp.eye(4), (N, 4, 4)),
    )
    T_prop = jax.vmap(se3.compose)(T_old, D_row)

    writable = m.kf.valid & ~m.kf.fixed
    T_new = jnp.where(in_snap[:, None, None], Tcw_opt, T_prop)
    T_new = se3.orthonormalize_fast(T_new)
    T_new = jnp.where(writable[:, None, None], T_new, T_old)
    kf = m.kf._replace(Tcw=T_new)

    # Landmarks: snapshot rows take the optimized positions; rows created
    # during the run move with their reference keyframe,
    # p' = T_ref_new^-1(T_ref_old(p)).
    M = m.mp.capacity
    prow = jnp.arange(M)
    ref = jnp.clip(m.mp.ref_kf, 0)
    p_cam = jax.vmap(se3.transform)(T_old[ref], m.mp.pos)
    p_prop = jax.vmap(lambda T, p: se3.transform(se3.inverse(T), p))(
        T_new[ref], p_cam
    )
    p_out = jnp.where((prow < n_mp_snap)[:, None], X_opt, p_prop)
    move = m.mp.valid & ~m.mp.fixed
    mp = m.mp._replace(pos=jnp.where(move[:, None], p_out, m.mp.pos))
    return m._replace(kf=kf, mp=mp)


class GlobalBARunner:
    """Background GBA with cancellation (the reference's mbStopGBA protocol).

    launch(map)   — snapshot the map, start/restart the worker thread
    abort()       — cancel between LM chunks (a new loop closure invalidates
                    the running GBA, LoopClosing.cc:413-428)
    try_merge(m)  — if a run finished, fold its result into the current map
    """

    def __init__(
        self,
        cam: cam_mod.Intrinsics,
        cfg: SlamConfig,
        n_iters: int | None = None,
        chunk: int = 2,
        synchronous: bool = False,
        mesh=None,
    ):
        self.cam = cam
        self.cfg = cfg
        self.n_iters = n_iters if n_iters is not None else cfg.loop.global_ba_iters
        self.chunk = chunk
        self.synchronous = synchronous
        # Multi-device: shard the camera axis over all visible devices and
        # run the SAME dense LM loop with psum collectives (VERDICT r2 #3 —
        # the server's production GBA entry IS the distributed engine when
        # >1 chip is visible; dryrun_multichip exercises this same path).
        #
        # Auto-meshing is restricted to REAL accelerator backends: on the
        # xla_force_host_platform_device_count virtual-CPU mesh, XLA:CPU
        # collectives rendezvous via N in-process threads with a 40 s
        # *process-terminating* watchdog (rendezvous.cc). An ASYNC GBA
        # thread running an all_gather while the main thread dispatches
        # tracking programs oversubscribes the 2-core test host, half the
        # rendezvous threads never get scheduled, and XLA aborts the whole
        # process ("Termination timeout ... Exiting to ensure a consistent
        # program state" — reproduced in the multi-loop e2e). Sharded-GBA
        # correctness on the virtual mesh is covered where the main thread
        # is quiescent: tests/test_parallel.py (explicit mesh) and
        # __graft_entry__.dryrun_multichip.
        if mesh is None and jax.device_count() > 1 \
                and jax.default_backend() != "cpu":
            import numpy as _np
            from ..parallel import distributed_ba as dba
            mesh = jax.sharding.Mesh(
                _np.asarray(jax.devices()), (dba.AXIS,))
        self.mesh = mesh
        self._abort = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._result = None  # (Tcw, X, n_kf_snap, n_mp_snap)
        self.runs_started = 0
        self.runs_aborted = 0
        self.runs_finished = 0

    # ------------------------------------------------------------------
    def launch(self, m: ms.MapState):
        self.abort()
        self._abort.clear()
        self.runs_started += 1
        # Materialize the snapshot NOW, on the caller's thread: the problem
        # build dispatches against the map's CURRENT buffers and returns
        # fresh arrays, and the cursors become host ints. The tracker's
        # per-frame program donates the map pytree (track_ops donate_argnums)
        # — donation deletes those buffers regardless of other Python refs,
        # so a worker thread holding `m` races "Array has been deleted".
        # problem_from_map passes Tcw/X through as the LIVE map buffers
        # (ba_dense.py problem builders), so copy every leaf that aliases
        # the map before handing off to the worker. The problem is SLICED
        # to the used rows (static buckets) so the LM loop stops paying
        # for capacity padding; full-capacity copies of the original
        # pose/point arrays are kept so the finished slice can be embedded
        # back for the capacity-shaped merge.
        n_kf_i, n_mp_i = int(m.n_kf), int(m.n_mp)
        prob = build_global_problem_dense(
            m, self.cfg, n_kf_hint=n_kf_i, n_mp_hint=n_mp_i,
            with_pm=self.mesh is None)
        prob = prob._replace(
            Tcw=jnp.array(prob.Tcw, copy=True),
            X=jnp.array(prob.X, copy=True),
        )
        Tcw_full = jnp.array(m.kf.Tcw, copy=True)
        X_full = jnp.array(m.mp.pos, copy=True)
        jax.block_until_ready(prob.Tcw)
        jax.block_until_ready(prob.X)
        jax.block_until_ready(prob.obs_active)
        jax.block_until_ready(Tcw_full)
        jax.block_until_ready(X_full)
        snap = (prob, n_kf_i, n_mp_i, Tcw_full, X_full)
        if self.synchronous:
            self._run(snap)
        else:
            self._thread = threading.Thread(
                target=self._run, args=(snap,), daemon=True)
            self._thread.start()

    def abort(self):
        if self._thread is not None and self._thread.is_alive():
            self._abort.set()
            self._thread.join()
            self.runs_aborted += 1
        self._thread = None
        with self._lock:
            self._result = None

    def busy(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def wait(self):
        if self._thread is not None:
            self._thread.join()

    # ------------------------------------------------------------------
    def _run(self, snap):
        prob, n_kf_snap, n_mp_snap, Tcw_full, X_full = snap
        done = 0
        while done < self.n_iters:
            if self._abort.is_set():
                return
            k = min(self.chunk, self.n_iters - done)
            # Huber kernels stay on for EVERY chunk (the reference's GBA
            # keeps robust kernels for all 10 iterations,
            # Optimizer.cc:54-120): the inlier re-classification of one
            # optimize() call does not carry into the next chunk's
            # obs_active, so a kernel-free later chunk would hand
            # mismatched observations a plain-L2 vote strong enough to
            # bend the whole map (post-loop seams have exactly those).
            if self.mesh is not None:
                from ..parallel import distributed_ba as dba
                res = dba.optimize_dense(
                    self.cam, prob, self.mesh, n_iters=k,
                    cg_iters=self.cfg.loop.gba_cg_iters, huber_iters=k,
                )
            else:
                res = ba_dense.optimize(
                    self.cam, prob, n_iters=k,
                    cg_iters=self.cfg.loop.gba_cg_iters, huber_iters=k,
                )
            # Block until the device finishes so abort is responsive at
            # chunk granularity (the jit dispatch itself is async).
            jax.block_until_ready(res.cost)
            prob = prob._replace(Tcw=res.Tcw, X=res.X)
            done += k
        # Embed the optimized slice back into capacity-shaped arrays for
        # the merge (rows past the slice keep their pre-BA values; merge
        # only reads rows < the snapshot cursors anyway).
        Tcw_out = Tcw_full.at[: prob.Tcw.shape[0]].set(prob.Tcw)
        X_out = X_full.at[: prob.X.shape[0]].set(prob.X)
        with self._lock:
            self._result = (Tcw_out, X_out, n_kf_snap, n_mp_snap)
        self.runs_finished += 1

    def try_merge(self, m: ms.MapState) -> ms.MapState:
        with self._lock:
            result, self._result = self._result, None
        if result is None:
            return m
        Tcw, X, n_kf_snap, n_mp_snap = result
        # int -> device scalar so the jitted merge compiles once, not per value.
        return merge_gba_result(m, Tcw, X, jnp.int32(n_kf_snap),
                                jnp.int32(n_mp_snap))
