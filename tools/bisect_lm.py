"""Bisect where the 463 ms/LM-iter goes in ba_dense.lm_step_dense at GBA
scale: build prefix programs (linearize+weights; +Hpp/precond; +RHS; +K CG
iters; full) and time each on-chip.

Run: timeout 2400 python -u tools/bisect_lm.py
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

from corbslam_tpu.geometry import camera as cam_mod
from corbslam_tpu.geometry import se3
from corbslam_tpu.optim import ba_dense
from corbslam_tpu.optim.smallmat import (
    chol_solve_factored, chol_unrolled, inv_spd_unrolled,
)

_PREC = jax.lax.Precision.HIGHEST


def timeit(name, fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:46s} {float(np.median(ts)):9.2f} ms", flush=True)


def build_problem():
    from corbslam_tpu.config import KITTI_STEREO
    from corbslam_tpu.loop import gba as gba_mod
    from corbslam_tpu.mapstate import mapstate as ms

    cam = cam_mod.Intrinsics.create(
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
    X[:P_used, 2] = rng.uniform(2, 80, P_used)
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
    return cam, gba_mod.build_global_problem_dense(m, cfg)


def main():
    print(jax.devices(), flush=True)
    cam, p = build_problem()
    jax.block_until_ready(p.obs_active)
    C, P = p.Tcw.shape[0], p.X.shape[0]
    Fb = p.obs_mp.shape[1]
    print(f"C={C} P={P} Fb={Fb}", flush=True)
    lam = jnp.float32(1e-4)

    def prefix(n_cg: int, with_back: bool):
        @jax.jit
        def run(p):
            active = p.obs_active
            lin = ba_dense._linearize(cam, p)
            c2 = ba_dense._chi2(lin)
            from corbslam_tpu.optim import reproj
            delta2 = jnp.where(p.obs_stereo, reproj.CHI2_STEREO,
                               reproj.CHI2_MONO)
            rw = reproj.huber_weights(c2, delta2)
            act_f = active.astype(jnp.float32)
            w = lin.w3 * (rw * act_f)
            Jc, Jp, r = lin.Jc, lin.Jp, lin.r
            Jc_w = Jc * w[:, None]
            Jp_w = Jp * w[:, None]
            free_c = (~p.pose_fixed).astype(jnp.float32)
            free_p = (~p.point_fixed).astype(jnp.float32)
            ids_flat = jnp.where(active, p.obs_mp, P).reshape(-1)

            sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            packed = jnp.stack([
                jnp.sum(Jp_w[:, i] * Jp[:, j], axis=0).reshape(-1)
                for i, j in sym
            ], axis=-1)
            hp = jax.ops.segment_sum(packed, ids_flat, P + 1)[:P]
            e = {s: hp[:, k] for k, s in enumerate(sym)}
            Hpp = jnp.stack([
                jnp.stack([e[(min(i, j), max(i, j))] for j in range(3)], -1)
                for i in range(3)
            ], -2)
            Hcc = jnp.einsum("ricf,rjcf->cij", Jc_w, Jc, precision=_PREC)
            hpp_diag = jnp.einsum("pii->pi", Hpp)
            hcc_diag = jnp.einsum("cii->ci", Hcc)
            Hpp_d = Hpp + (lam * hpp_diag + 1e-6)[..., None] * jnp.eye(3)
            Lpp = chol_unrolled(Hpp_d, 3)

            def point_solve(yv):
                return chol_solve_factored(Lpp, yv, 3) * free_p[:, None]

            def jc_dot(vc):
                return jnp.einsum("rjcf,cj->rcf", Jc, vc, precision=_PREC)

            def jp_dot(zp):
                zg_rows = zp[p.obs_mp]
                zg = jnp.stack([zg_rows[..., j] for j in range(3)])
                return jnp.einsum("rjcf,jcf->rcf", Jp, zg, precision=_PREC)

            def seg3(vals):
                pk = jnp.stack([v.reshape(-1) for v in vals], axis=-1)
                return jax.ops.segment_sum(pk, ids_flat, P + 1)[:P]

            def schur_mv(vc):
                vc = vc * free_c[:, None]
                a = jc_dot(vc)
                yv = seg3([jnp.sum(Jp_w[:, i] * a, axis=0) for i in range(3)])
                zp = point_solve(yv)
                mm = a - jp_dot(zp)
                Sv = jnp.einsum("rjcf,rcf->cj", Jc_w, mm, precision=_PREC)
                Sv = Sv + (lam * hcc_diag + 1e-8) * vc
                return Sv * free_c[:, None]

            gp = seg3([jnp.sum(Jp_w[:, i] * r, axis=0) for i in range(3)])
            z_g = point_solve(gp)
            m_b = r - jp_dot(z_g)
            b = -jnp.einsum("rjcf,rcf->cj", Jc_w, m_b,
                            precision=_PREC) * free_c[:, None]
            Hcc_d = Hcc + (lam * hcc_diag + 1e-8)[..., None] * jnp.eye(6)
            Minv = inv_spd_unrolled(Hcc_d, 6)

            def precond(rv):
                return jnp.einsum("cij,cj->ci", Minv, rv,
                                  precision=_PREC) * free_c[:, None]

            if n_cg < 0:
                return b.sum() + Lpp.sum() + Minv.sum()

            x0 = jnp.zeros_like(b)
            r0 = b
            z0 = precond(r0)
            rz0 = jnp.sum(r0 * z0)

            def cg_body(state, _):
                xv, rv, pdir, rz = state
                Ap = schur_mv(pdir)
                pAp = jnp.sum(pdir * Ap)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
                xv = xv + alpha * pdir
                rv = rv - alpha * Ap
                zz = precond(rv)
                rz_new = jnp.sum(rv * zz)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                return (xv, rv, zz + beta * pdir, rz_new), None

            (dc, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, r0, z0, rz0), None, length=n_cg)
            if not with_back:
                return dc.sum()
            ra = r + jc_dot(dc)
            y2 = seg3([jnp.sum(Jp_w[:, i] * ra, axis=0) for i in range(3)])
            dp = -point_solve(y2)
            T_new = se3.retract(p.Tcw, dc)
            return T_new.sum() + (p.X + dp).sum()

        return run

    timeit("assemble only (no CG)", lambda: prefix(-1, False)(p))
    timeit("assemble + 1 CG (scan)", lambda: prefix(1, False)(p))
    timeit("assemble + 5 CG (scan)", lambda: prefix(5, False)(p))
    timeit("assemble + 20 CG (scan)", lambda: prefix(20, False)(p))
    timeit("assemble + 20 CG + backsub", lambda: prefix(20, True)(p))

    @jax.jit
    def full_step(p):
        T, X2, c2, d2, dc = ba_dense.lm_step_dense(
            cam, p, p.obs_active, lam, True, 20, None)
        return T.sum() + X2.sum()

    timeit("lm_step_dense (while_loop CG)", lambda: full_step(p))




def main2():
    """Marginal-cost bisect of the REAL lm_step_dense by cg_iters."""
    print(jax.devices(), flush=True)
    cam, p = build_problem()
    jax.block_until_ready(p.obs_active)
    lam = jnp.float32(1e-4)
    for n_cg in (0, 1, 2, 5, 10, 20):
        @jax.jit
        def step(p, n_cg=n_cg):
            T, X2, c2, d2, dc = ba_dense.lm_step_dense(
                cam, p, p.obs_active, lam, True, n_cg, None, cg_tol=0.0)
            return T.sum() + X2.sum() + dc.sum()
        timeit(f"real lm_step cg={n_cg}", lambda: step(p))
    # chi2_of alone (the second linearize per optimize iteration)
    @jax.jit
    def chi2_only(p):
        lin = ba_dense._linearize(cam, p)
        c2 = ba_dense._chi2(lin)
        return c2.sum()
    timeit("chi2_of (2nd linearize)", lambda: chi2_only(p))
    # materialized linearize (no DCE: return full sums per plane forced
    # through different reductions so XLA keeps them)
    @jax.jit
    def lin_mat(p):
        lin = ba_dense._linearize(cam, p)
        return (jnp.abs(lin.Jc).sum(), jnp.abs(lin.Jp).sum(),
                jnp.abs(lin.r).sum())
    timeit("linearize abs-sums", lambda: lin_mat(p))

if __name__ == "__main__":
    main2()
