"""Section-level timing of the fused per-frame program on the real chip.

Run: timeout 1500 python -u tools/profile_fused.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from functools import partial

import jax.numpy as jnp
import numpy as np

RTT = None


def timeit(name, fn, reps=6):
    global RTT
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(ts))
    net = med - RTT if RTT else med
    print(f"{name:44s} {med:8.2f} ms  (net {net:7.2f})", flush=True)
    return med


def main():
    global RTT
    from corbslam_tpu.config import KITTI_STEREO
    from corbslam_tpu.frontend import frame as frame_mod
    from corbslam_tpu.frontend import track_ops
    from corbslam_tpu.frontend.tracking import StereoTracker
    from corbslam_tpu.geometry import camera, se3
    from corbslam_tpu.io import synthetic
    from corbslam_tpu.matching import matcher
    from corbslam_tpu.ops import orb

    print(jax.devices(), flush=True)
    cam = camera.Intrinsics.create(
        fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
        width=1241, height=376,
    )
    cfg = KITTI_STEREO
    world = synthetic.PlanarWorld(cam, texture_size=4096, plane_dist=12.0,
                                  texture_scale=60.0, seed=0)
    tilt = se3.exp(jnp.asarray([0, 0, 0, 0.35, 0, 0], jnp.float32))

    def gt_pose(i):
        xi = jnp.asarray([-(i * 0.3), 0, -(i * 0.05), 0, i * 0.002, 0], jnp.float32)
        return se3.compose(tilt, se3.exp(xi))

    frames = []
    for i in range(8):
        l, r = world.render_stereo(gt_pose(i))
        frames.append((jnp.asarray(np.asarray(l)), jnp.asarray(np.asarray(r))))

    # RTT baseline
    fid = jax.jit(lambda x: x * 1.0000001)
    jax.block_until_ready(fid(frames[0][0]))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(fid(frames[0][0]))
        ts.append((time.perf_counter() - t0) * 1e3)
    RTT = float(np.median(ts))
    print(f"RTT {RTT:.2f} ms", flush=True)

    tr = StereoTracker(cam, cfg)
    for i in range(4):
        tr.process_stereo(frames[i][0], frames[i][1], i * 0.1)
    m = tr.map
    prev = tr.last_frame
    vel = tr.velocity
    lr, lo = tr._local_rows, tr._local_ok
    rk = jnp.int32(tr.ref_kf)

    timeit("build_frame_stereo", lambda: frame_mod.build_frame_stereo(
        frames[5][0], frames[5][1], cam, cfg.orb))
    cur = frame_mod.build_frame_stereo(frames[5][0], frames[5][1], cam, cfg.orb)
    jax.block_until_ready(cur)

    timeit("orb.extract one image", lambda: jax.jit(
        lambda im: orb.extract(im, cfg.orb))(frames[5][0]))

    # motion model + pose opt only
    scales = jnp.asarray(cfg.orb.scales(), jnp.float32)

    @jax.jit
    def motion_only(m, prev, cur, vel):
        T_pred = se3.compose(vel, prev.Tcw)
        prev_has = prev.mp_idx >= 0
        prev_pos = m.mp.pos[jnp.clip(prev.mp_idx, 0)]
        mres = matcher.search_frame_frame(
            cam, T_pred, prev_pos, prev_has & prev.fvalid,
            prev.xy, prev.octave, prev.desc, prev.angle,
            cur.xy, cur.octave, cur.desc, cur.angle, cur.fvalid,
            scales, radius=cfg.matcher.search_radius_motion, max_dist=100)
        match_mp = jnp.where(mres.idx >= 0, prev.mp_idx[jnp.clip(mres.idx, 0)],
                             track_ops.NO_MP)
        return track_ops._pose_opt_from_matches(cam, T_pred, cur, m.mp.pos, match_mp)

    timeit("motion model + pose opt", lambda: motion_only(m, prev, cur, vel))
    Tcw0, mp0, _ = motion_only(m, prev, cur, vel)
    jax.block_until_ready((Tcw0, mp0))

    @jax.jit
    def cand_only(m, mp0):
        return track_ops._candidate_local_kfs(m, mp0, lr, lo, rk, cfg.capacity.local_window_kfs)

    timeit("candidate local KFs", lambda: cand_only(m, mp0))

    @jax.jit
    def local_only(m, cur, Tcw0, mp0):
        return track_ops._local_map_track(cam, m, cur, Tcw0, mp0, lr, lo, rk, cfg)

    timeit("local-map track (window)", lambda: local_only(m, cur, Tcw0, mp0))

    @jax.jit
    def core(m, cur, prev, vel):
        return track_ops._track_core(cam, m, cur, prev, vel, rk, lr, lo, cfg)

    timeit("_track_core (no frame build)", lambda: core(m, cur, prev, vel))

    # full fused (non-donated copy each call to be fair)
    def full():
        return track_ops.track_frame_stereo(
            jax.tree.map(lambda x: x, m), prev, vel,
            frames[6][0], frames[6][1], rk, lr, lo, cam, cfg)
    # donation: pass a fresh copy
    m2 = jax.tree.map(lambda x: x + 0 if hasattr(x, "dtype") else x, m)
    jax.block_until_ready(m2)

    def full2():
        nonlocal_m = track_ops.track_frame_stereo(
            m2, prev, vel, frames[6][0], frames[6][1], rk, lr, lo, cam, cfg)
        return nonlocal_m.summary

    out = track_ops.track_frame_stereo(
        m2, prev, vel, frames[6][0], frames[6][1], rk, lr, lo, cam, cfg)
    jax.block_until_ready(out.summary)
    m3 = out.map

    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        out = track_ops.track_frame_stereo(
            m3, prev, vel, frames[6][0], frames[6][1], rk, lr, lo, cam, cfg)
        np.asarray(out.summary)
        m3 = out.map
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{'track_frame_stereo FULL (donated)':44s} {np.median(ts):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
