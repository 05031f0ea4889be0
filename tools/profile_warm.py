"""Steady-state fps check: run the flagship scenario repeatedly in one
process and print per-frame latencies, to separate true per-frame cost from
first-execution warmup (compile/load/autotune residue) that poisons the
first measured window.

Run: timeout 1800 python -u tools/profile_warm.py
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


def main():
    from corbslam_tpu.config import KITTI_STEREO
    from corbslam_tpu.frontend.tracking import StereoTracker
    from corbslam_tpu.geometry import camera, se3
    from corbslam_tpu.io import synthetic

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
        xi = jnp.asarray([-(i * 0.3), 0.0, -(i * 0.05), 0.0, i * 0.002, 0.0],
                         jnp.float32)
        return se3.compose(tilt, se3.exp(xi))

    n_warm, n_meas = 6, 30
    frames = []
    for i in range(n_warm + n_meas):
        l, r = world.render_stereo(gt_pose(i))
        frames.append((np.asarray(l), np.asarray(r)))

    for rep in range(3):
        tracker = StereoTracker(cam, cfg)
        for i in range(n_warm):
            tracker.process_stereo(jnp.asarray(frames[i][0]),
                                   jnp.asarray(frames[i][1]), i * 0.1)
        for k in range(6):
            tracker._create_keyframe(tracker.last_frame, 0.05 * k, 120)
        jax.block_until_ready(tracker.map.mp.pos)
        lat = []
        t0 = time.time()
        for i in range(n_warm, n_warm + n_meas):
            tf = time.time()
            tracker.process_stereo(jnp.asarray(frames[i][0]),
                                   jnp.asarray(frames[i][1]), i * 0.1)
            lat.append(time.time() - tf)
        tracker.flush()
        _ = float(jnp.sum(tracker.last_frame.Tcw))
        dt = time.time() - t0
        fps = n_meas / dt
        ms = np.array(lat) * 1e3
        print(f"rep {rep}: {fps:5.2f} fps | frame ms "
              f"p50={np.percentile(ms, 50):6.1f} p90={np.percentile(ms, 90):6.1f} "
              f"max={ms.max():7.1f} | kfs={tracker.stats.n_keyframes}",
              flush=True)
        print("   per-frame ms:",
              " ".join(f"{v:.0f}" for v in ms), flush=True)


if __name__ == "__main__":
    main()
