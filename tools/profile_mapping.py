"""On-chip timing of the per-keyframe mapping pipeline stages.

Run: timeout 1800 python -u tools/profile_mapping.py
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

RTT = None


def timeit(name, fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(ts))
    print(f"{name:40s} {med:8.2f} ms  (net {med - (RTT or 0):7.2f})", flush=True)


def main():
    global RTT
    from corbslam_tpu.config import KITTI_STEREO
    from corbslam_tpu.frontend.tracking import StereoTracker
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
        xi = jnp.asarray([-(i * 0.3), 0, -(i * 0.05), 0, i * 0.002, 0], jnp.float32)
        return se3.compose(tilt, se3.exp(xi))

    x = jnp.ones((376, 1241), jnp.float32)
    fid = jax.jit(lambda x: x * 1.0000001)
    jax.block_until_ready(fid(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(fid(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    RTT = float(np.median(ts))
    print(f"RTT {RTT:.2f} ms", flush=True)

    tr = StereoTracker(cam, cfg)
    tr.mapping_queue_enabled = False  # stage manually below
    frames = []
    for i in range(10):
        l, r = world.render_stereo(gt_pose(i))
        frames.append((jnp.asarray(np.asarray(l)), jnp.asarray(np.asarray(r))))
    for i in range(6):
        tr.process_stereo(frames[i][0], frames[i][1], i * 0.1)
    # Force a few keyframes so the map is warm.
    for k in range(4):
        tr._create_keyframe(tr.last_frame, 0.05 * k, 120)
    print(f"map: n_kf={int(tr.map.n_kf)} n_mp={int(np.asarray(tr.map.mp.valid).sum())}",
          flush=True)
    m = tr.map
    kf_row = int(tr.map.n_kf) - 1

    from corbslam_tpu.frontend import track_ops
    cur = tr.last_frame

    def copy(mm):
        return jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a, mm)

    # Every mapping program donates the map, so each rep gets a fresh copy
    # (the copy cost itself is measured by the first line).
    timeit("tree copy of the map (baseline)", lambda: copy(m).mp.pos)
    timeit("insert_keyframe_with_points(+copy)", lambda: track_ops.
           insert_keyframe_with_points(cam, copy(m), cur, 99, 9.9, cfg,
                                       client=0)[0].mp.pos)
    timeit("fuse_into_kf(+copy)", lambda: local_mapping.fuse_into_kf(
        cam, copy(m), kf_row, cfg).mp.pos)
    timeit("cull_map_points(+copy)", lambda: local_mapping.cull_map_points(
        copy(m), kf_row, cfg).mp.pos)
    timeit("refresh_point_geometry(+copy)", lambda: local_mapping.
           refresh_point_geometry(copy(m), kf_row, cfg).mp.pos)
    timeit("sweep_detached(+copy)", lambda: local_mapping.sweep_detached(
        copy(m)).kf.mp_idx)
    timeit("local_ba(+copy)", lambda: local_mapping.local_ba(
        cam, copy(m), kf_row, cfg).mp.pos)
    timeit("cull_keyframes(+copy)", lambda: local_mapping.cull_keyframes(
        copy(m), kf_row, cfg)[0].mp.pos)

    # Whole mapping step as the tracker runs it
    def mapping_step():
        tr.map = copy(m)
        tr._mapping_step(kf_row)
        return tr.map.mp.pos

    timeit("full _mapping_step(+copy)", mapping_step)


if __name__ == "__main__":
    main()
