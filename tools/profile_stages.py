"""Per-stage timing breakdown of the tracking hot path on the real TPU chip.

Run: timeout 900 python -u tools/profile_stages.py
Prints one line per stage: name, median ms over N reps (post-warmup).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, reps=5):
    fn()  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:40s} {np.median(ts):8.2f} ms  (min {min(ts):.2f})")
    return np.median(ts)


def main():
    from corbslam_tpu.config import KITTI_STEREO
    from corbslam_tpu.frontend import frame as frame_mod
    from corbslam_tpu.frontend import track_ops
    from corbslam_tpu.frontend.tracking import StereoTracker
    from corbslam_tpu.geometry import camera, se3
    from corbslam_tpu.io import synthetic
    from corbslam_tpu.ops import brief, fast, orb, pyramid, stereo

    print(jax.devices())
    cam = camera.Intrinsics.create(
        fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
        width=1241, height=376,
    )
    cfg = KITTI_STEREO
    world = synthetic.PlanarWorld(cam, texture_size=4096, plane_dist=12.0,
                                  texture_scale=60.0, seed=0)
    tilt = se3.exp(jnp.asarray([0, 0, 0, 0.35, 0, 0], jnp.float32))

    def gt_pose(i):
        xi = jnp.asarray([-(i * 0.3), 0.0, -(i * 0.05), 0.0, i * 0.002, 0.0], jnp.float32)
        return se3.compose(tilt, se3.exp(xi))

    l0, r0 = world.render_stereo(gt_pose(0))
    l0 = jnp.asarray(np.asarray(l0))
    r0 = jnp.asarray(np.asarray(r0))

    # --- front-end stages ---
    pyr = jax.jit(lambda im: pyramid.build_pyramid(im, cfg.orb.n_levels, cfg.orb.scale_factor))
    timeit("pyramid.build_pyramid", lambda: pyr(l0))

    levels, blurred = pyr(l0)
    jax.block_until_ready(levels)

    budgets = cfg.orb.features_per_level()

    def fast_all():
        return [fast.detect(levels[i], cfg.orb.ini_th_fast, cfg.orb.cell_size,
                            budgets[i], cfg.orb.min_th_fast) for i in range(cfg.orb.n_levels)]
    fa = jax.jit(fast_all)
    timeit("fast.detect x8 levels (one jit)", lambda: fa())

    det = fa()
    xy0 = det[0][0]

    def ori_brief():
        a = brief.compute_orientation(levels[0], xy0)
        d = brief.compute_brief(blurred[0], xy0, a)
        return a, d
    ob = jax.jit(ori_brief)
    timeit("orientation+brief level0", lambda: ob())

    ex = jax.jit(lambda im: orb.extract(im, cfg.orb))
    timeit("orb.extract (one image)", lambda: ex(l0))
    fl = ex(l0)
    fr = ex(r0)
    jax.block_until_ready((fl, fr))

    scales = jnp.asarray(cfg.orb.scales(), jnp.float32)
    st = jax.jit(lambda: stereo.match_stereo_features(fl, fr, scales, float(cam.bf)))
    timeit("stereo.match_stereo_features", lambda: st())

    timeit("build_frame_stereo (full)", lambda: frame_mod.build_frame_stereo(l0, r0, cam, cfg.orb))

    # --- tracking stages with a warm map ---
    tracker = StereoTracker(cam, cfg)
    frames = []
    for i in range(8):
        l, r = world.render_stereo(gt_pose(i))
        frames.append((jnp.asarray(np.asarray(l)), jnp.asarray(np.asarray(r))))
    for i in range(8):
        tracker.process_stereo(frames[i][0], frames[i][1], i * 0.1)
    print(f"map: n_kf={int(tracker.map.n_kf)} n_mp={int(tracker.map.n_mp)}")

    cur = frame_mod.build_frame_stereo(frames[7][0], frames[7][1], cam, cfg.orb)
    jax.block_until_ready(cur)
    prev = tracker.last_frame
    T_pred = se3.compose(tracker.velocity, prev.Tcw)

    timeit("track_motion_model", lambda: track_ops.track_motion_model(
        cam, tracker.map.mp.pos, prev, cur, T_pred, tracker.scales,
        radius=cfg.matcher.search_radius_motion))

    Tcw, mp_idx, _ = track_ops.track_motion_model(
        cam, tracker.map.mp.pos, prev, cur, T_pred, tracker.scales,
        radius=cfg.matcher.search_radius_motion)

    timeit("track_local_map", lambda: track_ops.track_local_map(
        cam, tracker.map, cur, Tcw, mp_idx, cfg))

    res = track_ops.track_local_map(cam, tracker.map, cur, Tcw, mp_idx, cfg)

    def uts():
        return track_ops.update_tracking_stats(
            tracker.map, res.visible_rows, res.visible_mask, res.found_rows_mask)
    # NOTE: donates map; run on a copy each time
    m0 = tracker.map
    timeit("update_tracking_stats", lambda: track_ops.update_tracking_stats(
        jax.tree.map(lambda x: x + 0 if hasattr(x, 'dtype') else x, m0),
        res.visible_rows, res.visible_mask, res.found_rows_mask))

    # whole-frame time
    def whole():
        return tracker.process_stereo(frames[6][0], frames[6][1], 99.0)
    t0 = time.perf_counter()
    for i in range(5):
        tracker.process_stereo(frames[2 + (i % 4)][0], frames[2 + (i % 4)][1], 100.0 + i)
    jax.block_until_ready(tracker.map.mp.pos)
    print(f"whole process_stereo avg: {(time.perf_counter()-t0)/5*1e3:.2f} ms")


if __name__ == "__main__":
    main()
