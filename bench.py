"""Benchmark harness: flagship metric is stereo SLAM frames/sec per client
on KITTI-geometry imagery (1241x376, 2000 ORB features, 8 pyramid levels),
end to end: front-end extraction + stereo + motion tracking + local-map
tracking + keyframe/mapping work, on one chip.

Baseline: the reference replays KITTI stereo at its real-time pacing target
of 10 fps on CPU (BASELINE.md: Camera.fps in KITTI00-02.yaml; the repo
publishes no faster number).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BASELINE_FPS = 10.0


def main():
    from corbslam_tpu.config import KITTI_STEREO
    from corbslam_tpu.frontend.tracking import StereoTracker
    from corbslam_tpu.geometry import camera, se3
    from corbslam_tpu.io import synthetic

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

    n_warm, n_meas = 6, 30
    # Pre-render frames so rendering cost stays out of the measurement.
    frames = []
    for i in range(n_warm + n_meas):
        l, r = world.render_stereo(gt_pose(i))
        frames.append((np.asarray(l), np.asarray(r)))

    tracker = StereoTracker(cam, cfg)
    for i in range(n_warm):
        tracker.process_stereo(jnp.asarray(frames[i][0]), jnp.asarray(frames[i][1]), i * 0.1)
    # Warm the keyframe-insert + mapping programs (first KF on the measured
    # clip would otherwise compile INSIDE the timed window): force a few
    # keyframes through the full mapping pipeline, then keep their work in
    # the map (it only adds realism — the measured frames track against it).
    for k in range(6):
        tracker._create_keyframe(tracker.last_frame, 0.05 * k, 120)
    jax.block_until_ready(tracker.map.mp.pos)

    t0 = time.time()
    for i in range(n_warm, n_warm + n_meas):
        tracker.process_stereo(jnp.asarray(frames[i][0]), jnp.asarray(frames[i][1]), i * 0.1)
    jax.block_until_ready(tracker.map.mp.pos)
    dt = time.time() - t0

    fps = n_meas / dt
    print(json.dumps({
        "metric": "kitti_stereo_tracking_fps_per_client",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
