"""Honest TPU timings round 2: block gathers, scatters, segment ops."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

H, W = 376, 1241
K = 2048
RTT = None

def chain_time(name, f, x0, N=10, reps=5):
    global RTT
    y = f(x0)
    _ = float(jnp.max(jnp.ravel(y)[:1]) * 0)
    ts = []
    for _ in range(reps):
        y = f(x0)
        t0 = time.perf_counter()
        for _ in range(N):
            y = f(y)
        _ = float(jnp.max(jnp.ravel(y)[:1]))
        ts.append((time.perf_counter() - t0) * 1e3)
    med = np.median(ts)
    per = (med - RTT) / N if RTT else med / N
    print(f"{name:48s} total {med:8.2f} ms  per-op {per:7.3f} ms")
    return per

def main():
    global RTT
    print(jax.devices())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))

    f_id = jax.jit(lambda x: x * 1.0000001)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float(jnp.max(jnp.ravel(f_id(img))[:1]))
        ts.append((time.perf_counter() - t0) * 1e3)
    RTT = np.median(ts)
    print(f"RTT {RTT:.2f} ms")

    ys = jnp.asarray(rng.integers(0, H - 40, size=(K,)).astype(np.int32))
    xs = jnp.asarray(rng.integers(0, W - 40, size=(K,)).astype(np.int32))

    def dslice(im):
        p = jax.vmap(lambda y, x: jax.lax.dynamic_slice(im, (y, x), (40, 40)))(ys, xs)
        return im.at[:40, :40].add(jnp.mean(p, 0) * 1e-9)
    chain_time("vmap dynamic_slice [K]x40x40", jax.jit(dslice), img)

    def dslice_rows(im):
        # 40-row strips, full width: gather rows then slice columns cheaply?
        p = jax.vmap(lambda y: jax.lax.dynamic_slice(im, (y, 0), (40, W)))(ys[:256])
        return im.at[:40, :W].add(jnp.mean(p, 0) * 1e-9)
    chain_time("vmap dynamic_slice [256]x40xW strips", jax.jit(dslice_rows), img)

    patches = jnp.asarray(rng.normal(size=(K, 1600)).astype(np.float32))
    pidx = jnp.asarray(rng.integers(0, 1600, size=(K, 512)).astype(np.int32))
    def taa(p):
        v = jnp.take_along_axis(p, pidx, axis=1)
        return p.at[:, :512].add(v * 1e-9)
    chain_time("take_along_axis [K,1600]->[K,512]", jax.jit(taa), patches)

    # one-hot matmul within-patch sampling, 16 bins at once
    sel = jnp.asarray((rng.random((1600, 1024)) < 0.003).astype(np.float32))
    def selmm(p):
        v = jnp.dot(p, sel, preferred_element_type=jnp.float32)
        return p.at[:, :1024].add(v * 1e-9)
    chain_time("sel-matmul [K,1600]@[1600,1024]", jax.jit(selmm), patches)

    sel8 = jnp.asarray((rng.random((1600, 8192)) < 0.003).astype(np.float32))
    def selmm8(p):
        v = jnp.dot(p, sel8, preferred_element_type=jnp.float32)
        return p.at[:, :1600].add(v[:, :1600] * 1e-9)
    chain_time("sel-matmul [K,1600]@[1600,8192]", jax.jit(selmm8), patches)

    # scatter rows: update [131072] stats at K indices
    stats = jnp.zeros(131072, jnp.float32)
    sidx = jnp.asarray(rng.integers(0, 131072, size=(K,)).astype(np.int32))
    def scat(s):
        return s.at[sidx].add(1.0) * 0.999999
    chain_time("scatter-add [K] into [131072]", jax.jit(scat), stats)

    # scatter a keyframe row set: [2048,32] into [2048,2048,32]
    desc = jnp.zeros((256, 2048, 32), jnp.float32)
    rowd = jnp.asarray(rng.normal(size=(2048, 32)).astype(np.float32))
    def scrow(d):
        return d.at[5].set(rowd + d[5] * 1e-9)
    chain_time("row set [2048,32] into [256,2048,32]", jax.jit(scrow), desc)

    # segment_sum over W*F obs (local BA inner op)
    vals = jnp.asarray(rng.normal(size=(49152, 3)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 8192, size=(49152,)).astype(np.int32))
    def segs(v):
        s = jax.ops.segment_sum(v, seg, 8192)
        return v.at[:8192].add(s * 1e-9)
    chain_time("segment_sum [49152,3]->[8192,3]", jax.jit(segs), vals)

    # gather rows [2048] from [131072,3] (mp.pos[rows])
    mp = jnp.asarray(rng.normal(size=(131072, 3)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, 131072, size=(8192,)).astype(np.int32))
    def grow(m):
        v = m[gidx]
        return m.at[:8192].add(v * 1e-9)
    chain_time("row gather [8192,3] from [131072,3]", jax.jit(grow), mp)

    mpd = jnp.asarray(rng.integers(0, 255, size=(131072, 32)).astype(np.uint8)).astype(jnp.float32)
    def growd(m):
        v = m[gidx]
        return m.at[:8192].add(v * 1e-9)
    chain_time("row gather [8192,32] from [131072,32]", jax.jit(growd), mpd)

    # covis_weights_single-ish: mask[idx] lookup [2048,2048] from [131072] + sum
    mask = jnp.zeros(131072, jnp.float32)
    idx = jnp.asarray(rng.integers(0, 131072, size=(2048, 2048)).astype(np.int32))
    def covis(mk):
        v = mk[idx]  # [2048, 2048] gather from [131072]
        w = jnp.sum(v, axis=1)
        return mk.at[:2048].add(w * 1e-9)
    chain_time("gather [2048x2048] from [131072] + sum", jax.jit(covis), mask)

if __name__ == "__main__":
    main()
