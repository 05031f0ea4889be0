"""On-chip ablation of dense-BA primitive costs, immune to dispatch
overhead: each primitive runs REPS times inside one jitted lax.scan (the
carry perturbs the input so nothing hoists), and the wall is divided by
REPS. Run: timeout 590 python -u tools/ablate_ba.py
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

REPS = 30


def scan_time(name, op):
    """op: scalar-perturbation -> array; timed inside one jit."""

    @jax.jit
    def run(c0):
        def body(c, _):
            out = op(1.0 + c * 1e-12)
            return jnp.sum(out) * 1e-20 + c, None

        c, _ = jax.lax.scan(body, c0, None, length=REPS)
        return c

    float(run(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:42s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    C, F, P = 2048, 512, 131072
    vals = jnp.asarray(rng.normal(size=(C, F)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 49152, (C, F)), jnp.int32)
    ids_flat = ids.reshape(-1)
    ids_sorted = jnp.sort(ids_flat)
    zp = jnp.asarray(rng.normal(size=(P,)).astype(np.float32))
    J = jnp.asarray(rng.normal(size=(3, 6, C, F)).astype(np.float32) * 0.01)
    Jp = jnp.asarray(rng.normal(size=(3, 3, C, F)).astype(np.float32) * 0.01)
    v6 = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32))
    m3 = jnp.asarray(rng.normal(size=(3, C, F)).astype(np.float32))

    scan_time("noop (scan overhead)", lambda s: vals[:1, :1] * s)
    scan_time("elementwise [C,F] x3", lambda s: vals * s + vals * vals * s)
    scan_time("row-reduce [C,F]->[C]", lambda s: jnp.sum(vals * s, axis=1))
    scan_time("segment_sum 1M->131k",
              lambda s: jax.ops.segment_sum((vals * s).reshape(-1), ids_flat, P + 1)[:P])
    scan_time("segment_sum 1M sorted",
              lambda s: jax.ops.segment_sum((vals * s).reshape(-1), ids_sorted,
                                            P + 1, indices_are_sorted=True)[:P])
    scan_time("gather 131k->[C,F]", lambda s: jnp.take(zp * s, ids))
    scan_time("jc_dot einsum rjcf,cj->rcf",
              lambda s: jnp.einsum("rjcf,cj->rcf", J, v6 * s))
    scan_time("Sv einsum rjcf,rcf->cj",
              lambda s: jnp.einsum("rjcf,rcf->cj", J, m3 * s))
    scan_time("Hcc einsum ricf,rjcf->cij",
              lambda s: jnp.einsum("ricf,rjcf->cij", J * s, J))
    scan_time("Jp prod+rowsum (Hpp pre-scatter x6)",
              lambda s: jnp.sum(Jp[:, 0] * (Jp[:, 1] * s), axis=0))
    # unrolled alternative to jc_dot einsum
    def jc_unroll(s):
        v = v6 * s
        acc = []
        for r in range(3):
            t = jnp.zeros_like(vals)
            for j in range(6):
                t = t + J[r, j] * v[:, j, None]
            acc.append(t)
        return jnp.stack(acc)
    scan_time("jc_dot unrolled FMA", jc_unroll)

    def sv_unroll(s):
        m = m3 * s
        cols = []
        for j in range(6):
            t = jnp.zeros_like(vals)
            for r in range(3):
                t = t + J[r, j] * m[r]
            cols.append(jnp.sum(t, axis=1))
        return jnp.stack(cols, -1)
    scan_time("Sv unrolled FMA+rowsum", sv_unroll)

    # --- locality + packing variants -----------------------------------
    # Clustered ids: each camera row sees a contiguous band of points (the
    # real GBA structure from sliding-window allocation).
    base = rng.integers(0, 49152 - F, C)
    ids_band = jnp.asarray(
        base[:, None] + np.arange(F)[None, :], jnp.int32)
    scan_time("segsum 1M banded ids",
              lambda s: jax.ops.segment_sum((vals * s).reshape(-1),
                                            ids_band.reshape(-1), P + 1)[:P])
    scan_time("gather 131k banded ids", lambda s: jnp.take(zp * s, ids_band))
    # 3-component scatter in one op ([CF, 3] operand).
    v3 = jnp.asarray(rng.normal(size=(C * F, 3)).astype(np.float32))
    scan_time("segsum 1M x3-packed [CF,3]",
              lambda s: jax.ops.segment_sum(v3 * s, ids_flat, P + 1)[:P])
    # 3-component gather in one op (rows of [P, 3]).
    zp3 = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
    scan_time("row-gather [P,3] -> [C,F,3]",
              lambda s: (zp3 * s)[ids])
    # scatter into [P, 8] padded component block
    v8 = jnp.asarray(rng.normal(size=(C * F, 8)).astype(np.float32))
    scan_time("segsum 1M x8-packed [CF,8]",
              lambda s: jax.ops.segment_sum(v8 * s, ids_flat, P + 1)[:P])


if __name__ == "__main__":
    main()
