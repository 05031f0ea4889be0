"""Diagnose the post-loop keyframe-ATE regression (VERDICT r4 item #1).

Replicates tests/test_loop_e2e.py exactly (8-device CPU mesh, same config,
same world/orbit) but instruments every map-bending event: loop correction,
GBA merge, split-local-BA writebacks (committed vs aborted), and logs the
keyframe ATE right after each event plus at the end.

Flags:
  --fused-ba   revert to the pre-c0ebc9b fused local BA stage
  --no-ba      drop local BA stages entirely
  --sync-gba   (default true, like the test)
"""

import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax.numpy as jnp
import numpy as np

from corbslam_tpu import system as system_mod
from corbslam_tpu.config import (
    CapacityConfig, MappingConfig, OrbConfig, SlamConfig, TrackingConfig,
)
from corbslam_tpu.frontend import frame as frame_mod
from corbslam_tpu.frontend import tracking as tracking_mod
from corbslam_tpu.geometry import camera, se3
from corbslam_tpu.io import synthetic, trajectory
from corbslam_tpu.mapping import local_mapping
from corbslam_tpu.place import vocab as vocab_mod

CAM = camera.Intrinsics.create(
    fx=320.0, fy=320.0, cx=160.0, cy=120.0, bf=320.0 * 0.5,
    width=320, height=240,
)
CFG = SlamConfig(
    orb=OrbConfig(n_features=512, n_levels=4, cell_size=12),
    tracking=TrackingConfig(th_depth=40.0, max_frames_between_kf=10),
    mapping=MappingConfig(local_ba_window=8, local_ba_iters=6),
    capacity=CapacityConfig(
        max_keyframes=256, max_map_points=32768, max_features=512,
        local_window_kfs=8, local_window_mps=2048,
    ),
)
STEP, RADIUS = 0.05, 6.0
N_FRAMES = int(np.ceil(2 * np.pi / STEP)) + 25


def orbit_pose(i):
    th = STEP * i
    Twc = se3.compose(
        se3.exp(jnp.asarray([0, 0, 0, 0.0, th, 0.0], jnp.float32)),
        se3.from_Rt(jnp.eye(3), jnp.asarray([0.0, 0.0, -RADIUS])),
    )
    return se3.inverse(Twc)


def kf_ate(m, gtw):
    valid = np.asarray(m.kf.valid)
    fid = np.asarray(m.kf.frame_id)[valid]
    kf_Tcw = np.asarray(m.kf.Tcw)[valid]
    sel = fid < len(gtw)
    if sel.sum() < 3:
        return float("nan")
    est_kf = np.asarray([np.asarray(se3.inverse(jnp.asarray(T)))
                         for T in kf_Tcw[sel]])
    return trajectory.ate_rmse(est_kf, gtw[fid[sel]], align=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused-ba", action="store_true")
    ap.add_argument("--no-ba", action="store_true")
    args = ap.parse_args()

    world = synthetic.MultiPlaneWorld.room(
        CAM, half=14.0, height=3.0, noise_std=3.0, seed=2)
    gt = [orbit_pose(i) for i in range(N_FRAMES)]
    gtw = np.asarray([np.asarray(se3.inverse(T)) for T in gt])

    descs = []
    for i in (0, N_FRAMES // 3, 2 * N_FRAMES // 3):
        img, _ = world.render_stereo(gt[i], frame=i)
        f = frame_mod.build_frame_mono(img, CAM, CFG.orb)
        descs.append(np.asarray(f.desc)[np.asarray(f.fvalid)])
    voc = vocab_mod.train(jnp.asarray(np.concatenate(descs)),
                          n_words=1024, n_iters=6)

    # ---- instrumentation: wrap the stage methods --------------------------
    T = tracking_mod.StereoTracker
    orig_loop = T._stage_loop_closing
    orig_bab = T._stage_local_ba_b
    orig_enq = T._enqueue_mapping_stages

    def stage_loop(self, kf_row):
        loops0 = self.loop_closer.stats.n_loops_closed
        orig_loop(self, kf_row)
        if self.loop_closer.stats.n_loops_closed != loops0:
            print(f"[evt] frame={self.frame_id} LOOP CLOSED kf_row={kf_row} "
                  f"epoch->{self.map_epoch} ate_kf={kf_ate(self.map, gtw):.4f}",
                  flush=True)

    def stage_bab(self, st):
        aborted = st.get("res") is None or st["epoch"] != self.map_epoch
        orig_bab(self, st)
        tag = "ABORT" if aborted else "commit"
        print(f"[evt] frame={self.frame_id} ba_b {tag} "
              f"epoch={self.map_epoch} ate_kf={kf_ate(self.map, gtw):.4f}",
              flush=True)

    def enq(self, kf_row):
        if args.no_ba:
            nk = self.stats.n_keyframes
            saved = None
            orig_enq(self, kf_row)
            # strip the BA stages we just queued (match by name)
            return
        if args.fused_ba:
            # replicate pre-c0ebc9b behavior: fused local_ba single stage
            q = self._stage_q
            nk = self.stats.n_keyframes
            before = len(q)
            orig_enq(self, kf_row)
            # remove the 3 split stages, replace with fused
            items = list(q)
            del items[before:]
            q.clear()
            q.extend(items)
            # rebuild manually (same order as _enqueue_mapping_stages)
            from corbslam_tpu.mapping import triangulation
            if self.sensor == "mono":
                q.append(lambda: setattr(
                    self, "map",
                    triangulation.create_new_points(
                        self.cam, self.map, kf_row, self.cfg)))
            q.append(lambda: setattr(
                self, "map",
                local_mapping.fuse_into_kf(self.cam, self.map, kf_row, self.cfg)))
            if nk % 2 == 0:
                q.append(lambda: setattr(
                    self, "map",
                    local_mapping.cull_map_points(self.map, kf_row, self.cfg)))
                q.append(lambda: setattr(
                    self, "map",
                    local_mapping.refresh_point_geometry(
                        self.map, kf_row, self.cfg)))
            if nk >= 3:
                q.append(lambda: setattr(
                    self, "map",
                    local_mapping.local_ba(self.cam, self.map, kf_row, self.cfg)))
            if nk % 3 == 0 and nk > 5:
                q.append(lambda: self._stage_cull_keyframes(kf_row))
            if nk % 6 == 0 and nk > 5:
                q.append(lambda: setattr(
                    self, "map", local_mapping.sweep_detached(self.map)))
            if self.loop_closer is not None:
                q.append(lambda: self._stage_loop_closing(kf_row))
            return
        orig_enq(self, kf_row)

    T._stage_loop_closing = stage_loop
    T._stage_local_ba_b = stage_bab
    T._enqueue_mapping_stages = enq

    c = system_mod.CorbslamClient(
        CAM, CFG, sensor="stereo", client_id=1, voc=voc,
        enable_loop_closing=True, run_gba=True,
    )
    c.loop_closer.gba_runner.synchronous = True

    # also instrument GBA merges + close_loop Sim3 quality
    lc = c.loop_closer
    orig_close = lc.close_loop

    def close_loop(m, kf_q, kf_c, sb):
        from corbslam_tpu.matching import matcher
        Tq = np.asarray(m.kf.Tcw[kf_q])
        Tc = np.asarray(m.kf.Tcw[kf_c])
        # expected S_qc if map already consistent: T_q o T_c^-1 (s=1)
        Texp = Tq @ np.linalg.inv(Tc)
        R, t, s = np.asarray(sb.R), np.asarray(sb.t), float(sb.s)
        dR = np.abs(R - Texp[:3, :3]).max()
        dt = np.linalg.norm(t - Texp[:3, 3])
        print(f"[evt] CLOSE_LOOP q={kf_q} c={kf_c} n_bow={int(sb.n_bow)} "
              f"n_inl={int(sb.n_inliers)} n_total={int(sb.n_total)} "
              f"s={s:.4f} dR={dR:.4f} dt={dt:.4f}", flush=True)
        # replicate compute_sim3's pairing to inspect the correspondences
        mp_q = m.kf.mp_idx[kf_q]
        mp_c = m.kf.mp_idx[kf_c]
        bound_q = m.kf.fvalid[kf_q] & (mp_q >= 0)
        bound_c = m.kf.fvalid[kf_c] & (mp_c >= 0)
        res = matcher.search_by_descriptor(
            m.kf.desc[kf_q], bound_q, m.kf.desc[kf_c], bound_c,
            max_dist=CFG.matcher.th_low, ratio=0.75,
        )
        pair_ok = np.asarray((res.idx >= 0) & bound_q)
        mq = np.asarray(mp_q)
        mc = np.asarray(mp_c)[np.clip(np.asarray(res.idx), 0, None)]
        pair_ok = pair_ok & (mc >= 0)
        pos = np.asarray(m.mp.pos)
        wq = pos[np.clip(mq, 0, None)][pair_ok]
        wc = pos[np.clip(mc, 0, None)][pair_ok]
        wd = np.linalg.norm(wq - wc, axis=1)
        print(f"[evt]   pairs={pair_ok.sum()} world-dist of paired landmarks: "
              f"p10={np.percentile(wd,10):.3f} med={np.median(wd):.3f} "
              f"p90={np.percentile(wd,90):.3f}", flush=True)
        # binding sanity: do q's bound landmarks reproject onto q's features?
        from corbslam_tpu.geometry import camera as cam_mod2
        for name, row, mm in (("q", kf_q, mq), ("c", kf_c, np.asarray(mp_c))):
            bb = np.asarray(m.kf.fvalid[row]) & (mm >= 0)
            pcam = (np.asarray(m.kf.Tcw[row])[:3, :3] @ pos[np.clip(mm, 0, None)].T).T \
                + np.asarray(m.kf.Tcw[row])[:3, 3]
            uv = np.asarray(cam_mod2.project(CAM, jnp.asarray(pcam)))
            duv = np.linalg.norm(uv - np.asarray(m.kf.xy[row]), axis=1)[bb]
            print(f"[evt]   {name}-binding reproj: med={np.median(duv):.2f}px "
                  f"p90={np.percentile(duv,90):.2f}px n={bb.sum()}", flush=True)
        # how many pairs are inliers of the identity-correction model?
        p1 = (Tq[:3, :3] @ wq.T).T + Tq[:3, 3]
        p2 = (Tc[:3, :3] @ wc.T).T + Tc[:3, 3]
        pred = (Texp[:3, :3] @ p2.T).T + Texp[:3, 3]
        d3 = np.linalg.norm(pred - p1, axis=1)
        print(f"[evt]   3D resid under identity-correction: med={np.median(d3):.3f} "
              f"under accepted Sim3: "
              f"{np.median(np.linalg.norm((s*(R@p2.T).T+t)-p1,axis=1)):.3f}",
              flush=True)
        return orig_close(m, kf_q, kf_c, sb)
    lc.close_loop = close_loop
    orig_merge = lc.try_merge_gba

    def merge(m):
        out = orig_merge(m)
        if out is not m:
            print(f"[evt] GBA MERGE ate_kf={kf_ate(out, gtw):.4f}", flush=True)
        return out
    lc.try_merge_gba = merge

    t0 = time.time()
    for i in range(N_FRAMES):
        l, r = world.render_stereo(gt[i], frame=i)
        c.track_stereo(l, r, timestamp=i * 0.1)
    c.shutdown()
    dt = time.time() - t0

    est = np.asarray([np.asarray(se3.inverse(jnp.asarray(Tc)))
                      for _, Tc in c.tracker.trajectory])
    ate_frames = trajectory.ate_rmse(est, gtw, align=True)
    final = kf_ate(c.tracker.map, gtw)
    print(f"[final] ate_frames={ate_frames:.4f} ate_kf={final:.4f} "
          f"loops={lc.stats.n_loops_closed} "
          f"gba_runs={lc.gba_runner.runs_finished} wall={dt:.0f}s", flush=True)


if __name__ == "__main__":
    main()
