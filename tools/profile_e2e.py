"""End-to-end fps ablation on the real chip: run the flagship tracking
scenario with pipeline components selectively disabled to localize the
per-frame budget. Timing is wall-clock over whole measured windows (the
tracker's per-frame retire fetches the summary, so frames are honestly
synced — no reliance on block_until_ready through the axon tunnel).

Run: timeout 900 python -u tools/profile_e2e.py
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


def run_scenario(name, frames, cam, cfg, n_warm, mutate=None):
    from corbslam_tpu.frontend.tracking import StereoTracker

    tracker = StereoTracker(cam, cfg)
    if mutate:
        mutate(tracker)
    for i in range(n_warm):
        tracker.process_stereo(frames[i][0], frames[i][1], i * 0.1)
    if tracker.mapping_queue_enabled:
        for k in range(6):
            tracker._create_keyframe(tracker.last_frame, 0.05 * k, 120)
    jax.block_until_ready(tracker.map.mp.pos)
    n_meas = len(frames) - n_warm
    t0 = time.time()
    for i in range(n_warm, len(frames)):
        tracker.process_stereo(jnp.asarray(frames[i][0]),
                               jnp.asarray(frames[i][1]), i * 0.1)
    tracker.flush()
    # hard sync on real values
    _ = float(jnp.sum(tracker.last_frame.Tcw))
    dt = time.time() - t0
    fps = n_meas / dt
    print(f"{name:44s} {fps:6.2f} fps  ({1e3 * dt / n_meas:7.1f} ms/frame)  "
          f"kfs={tracker.stats.n_keyframes}", flush=True)
    return fps


def main():
    from corbslam_tpu.config import KITTI_STEREO
    from corbslam_tpu.geometry import camera, se3
    from corbslam_tpu.io import synthetic
    from corbslam_tpu.mapping import local_mapping

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

    run_scenario("full pipeline (bench flagship)", frames, cam, cfg, n_warm)

    def no_mapping(t):
        t.mapping_queue_enabled = False
    run_scenario("tracking only (no KF mapping)", frames, cam, cfg, n_warm,
                 mutate=no_mapping)

    orig_ba = local_mapping.local_ba
    local_mapping.local_ba = lambda cam_, m, row, cfg_: m
    run_scenario("mapping without local BA", frames, cam, cfg, n_warm)
    local_mapping.local_ba = orig_ba

    orig_fuse = local_mapping.fuse_into_kf
    local_mapping.fuse_into_kf = lambda cam_, m, row, cfg_: m
    run_scenario("mapping without fuse", frames, cam, cfg, n_warm)
    local_mapping.fuse_into_kf = orig_fuse

    orig_cull = local_mapping.cull_map_points
    orig_refresh = local_mapping.refresh_point_geometry
    local_mapping.cull_map_points = lambda m, row, cfg_: m
    local_mapping.refresh_point_geometry = lambda m, row, cfg_: m
    run_scenario("mapping without cull/refresh", frames, cam, cfg, n_warm)
    local_mapping.cull_map_points = orig_cull
    local_mapping.refresh_point_geometry = orig_refresh

    orig_kfcull = local_mapping.cull_keyframes
    local_mapping.cull_keyframes = lambda m, row, cfg_: (m, jnp.zeros(
        m.kf.capacity, bool))
    run_scenario("mapping without KF culling", frames, cam, cfg, n_warm)
    local_mapping.cull_keyframes = orig_kfcull


if __name__ == "__main__":
    main()
