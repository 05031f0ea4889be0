"""On-chip ablation of the dense-plane GBA LM step at r4 flagship scale
(768 KF x 512 obs, 98k points): which part of lm_step_dense owns the
463 ms/iter wall — linearization, the point-side segment-sum scatters, or
the CG matvec chain?

Run: timeout 2400 python -u tools/ablate_gba.py
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
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:44s} {float(np.median(ts)):9.2f} ms", flush=True)


def main():
    from bench import bench_gba  # reuse the problem builder path
    from corbslam_tpu.config import KITTI_STEREO
    from corbslam_tpu.geometry import camera
    from corbslam_tpu.loop import gba as gba_mod
    from corbslam_tpu.mapstate import mapstate as ms
    from corbslam_tpu.optim import ba_dense

    print(jax.devices(), flush=True)
    cam = camera.Intrinsics.create(
        fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
        width=1241, height=376,
    )
    cfg = KITTI_STEREO
    cap = cfg.capacity
    rng = np.random.default_rng(0)
    N_used, P_used, obs_per_kf = 768, 98304, 512
    m = ms.empty(cap)
    t = np.linspace(0, 60.0, N_used)
    Tcw = np.tile(np.eye(4, dtype=np.float32), (cap.max_keyframes, 1, 1))
    Tcw[:N_used, 2, 3] = -t
    X = np.zeros((cap.max_map_points, 3), np.float32)
    X[:P_used, 0] = rng.uniform(-8, 8, P_used)
    X[:P_used, 1] = rng.uniform(-2, 2, P_used)
    X[:P_used, 2] = rng.uniform(2, 80, P_used) + np.repeat(
        np.linspace(0, 60.0, P_used // 64 + 1), 64)[:P_used]
    F = cap.max_features
    mp_idx = np.full((cap.max_keyframes, F), -1, np.int32)
    fv = np.zeros((cap.max_keyframes, F), bool)
    xy = np.zeros((cap.max_keyframes, F, 2), np.float32)
    ur = np.full((cap.max_keyframes, F), -1.0, np.float32)
    stride = max(1, (P_used - obs_per_kf) // max(N_used - 1, 1))
    for k in range(N_used):
        pts = (k * stride + np.arange(obs_per_kf)) % P_used
        Xc = X[pts] - np.array([0, 0, -t[k]], np.float32)
        z = np.maximum(Xc[:, 2], 0.5)
        u = cam.fx * Xc[:, 0] / z + cam.cx
        v = cam.fy * Xc[:, 1] / z + cam.cy
        mp_idx[k, :obs_per_kf] = pts
        fv[k, :obs_per_kf] = True
        xy[k, :obs_per_kf, 0] = u
        xy[k, :obs_per_kf, 1] = v
        ur[k, :obs_per_kf] = u - cam.bf / z
    kf = m.kf._replace(
        Tcw=jnp.asarray(Tcw),
        valid=jnp.asarray(np.arange(cap.max_keyframes) < N_used),
        xy=jnp.asarray(xy), uright=jnp.asarray(ur),
        fvalid=jnp.asarray(fv), mp_idx=jnp.asarray(mp_idx),
    )
    mp = m.mp._replace(
        pos=jnp.asarray(X),
        valid=jnp.asarray(np.arange(cap.max_map_points) < P_used),
    )
    m = m._replace(kf=kf, mp=mp, n_kf=jnp.int32(N_used), n_mp=jnp.int32(P_used))
    p = gba_mod.build_global_problem_dense(m, cfg)
    jax.block_until_ready(p.obs_active)
    C, P = p.Tcw.shape[0], p.X.shape[0]
    print(f"C={C} P={P} obs={p.obs_mp.shape}", flush=True)

    # --- pieces ---------------------------------------------------------
    lam = jnp.float32(1e-4)
    active = p.obs_active

    @jax.jit
    def lin_only(p):
        lin = ba_dense._linearize(cam, p)
        return lin.r.sum() + lin.Jc.sum() + lin.Jp.sum()

    timeit("linearize (r, Jc, Jp planes)", lambda: lin_only(p))

    lin = ba_dense._linearize(cam, p)
    ids_flat = jnp.where(active, p.obs_mp, P).reshape(-1)
    act_f = active.astype(jnp.float32)
    w = lin.w3 * act_f
    Jc_w = lin.Jc * w[:, None]
    Jp_w = lin.Jp * w[:, None]
    jax.block_until_ready(Jc_w)

    @jax.jit
    def seg6(Jp_w, Jp, ids_flat):
        sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        packed = jnp.stack([
            jnp.sum(Jp_w[:, i] * Jp[:, j], axis=0).reshape(-1) for i, j in sym
        ], axis=-1)
        return jax.ops.segment_sum(packed, ids_flat, P + 1)[:P]

    timeit("Hpp assembly: packed 6-seg scatter", lambda: seg6(lin.Jp, lin.Jp, ids_flat))

    @jax.jit
    def seg3(a, ids_flat):
        packed = jnp.stack([a.reshape(3, -1)[i] for i in range(3)], -1)
        return jax.ops.segment_sum(packed, ids_flat, P + 1)[:P]

    a0 = jnp.ones((3, C, p.obs_mp.shape[1]), jnp.float32)
    timeit("one 3-component segment scatter", lambda: seg3(a0, ids_flat))

    @jax.jit
    def gather_rows(zp, ids):
        return zp[ids].sum()

    zp = jnp.ones((P, 3), jnp.float32)
    timeit("one [P,3] row gather over obs", lambda: gather_rows(zp, p.obs_mp))

    @jax.jit
    def einsum_jc(Jc, vc):
        return jnp.einsum("rjcf,cj->rcf", Jc, vc,
                          precision=jax.lax.Precision.HIGHEST).sum()

    vc = jnp.ones((C, 6), jnp.float32)
    timeit("Jc v plane einsum", lambda: einsum_jc(lin.Jc, vc))

    # --- full steps -----------------------------------------------------
    @jax.jit
    def one_lm_fixed_cg(p):
        T, X2, c2, d2, dc = ba_dense.lm_step_dense(
            cam, p, p.obs_active, lam, True, 20, None, x0=None, cg_tol=0.0)
        return T.sum() + X2.sum()

    @jax.jit
    def one_lm_tol_cg(p):
        T, X2, c2, d2, dc = ba_dense.lm_step_dense(
            cam, p, p.obs_active, lam, True, 20, None, x0=None, cg_tol=0.03)
        return T.sum() + X2.sum()

    timeit("ONE LM step, cg=20 fixed (tol=0)", lambda: one_lm_fixed_cg(p))
    timeit("ONE LM step, cg<=20 tol=0.03", lambda: one_lm_tol_cg(p))

    res = ba_dense.optimize(cam, p, n_iters=10, cg_iters=20, huber_iters=3)
    jax.block_until_ready(res.cost)
    t0 = time.time()
    res = ba_dense.optimize(cam, p, n_iters=10, cg_iters=20, huber_iters=3)
    jax.block_until_ready(res.cost)
    print(f"full optimize 10 iters: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
