"""Honest TPU compute timing through the axon relay.

block_until_ready does not round-trip, so: run a dependent chain of N ops,
force one scalar readback, subtract the readback baseline, divide by N.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

H, W = 376, 1241

RTT = None

def chain_time(name, f, x0, N=20, reps=5):
    """f: x -> x-like. Times N dependent applications + one readback."""
    global RTT
    y = f(x0)
    _ = float(jnp.sum(y).block_until_ready() * 0)  # compile + settle
    # readback baseline
    ts = []
    for _ in range(reps):
        y = f(x0)
        t0 = time.perf_counter()
        for _ in range(N):
            y = f(y)
        s = float(jnp.max(jnp.ravel(y)[:1]))
        ts.append((time.perf_counter() - t0) * 1e3)
    med = np.median(ts)
    per = (med - RTT) / N if RTT else med / N
    print(f"{name:45s} total {med:8.2f} ms  per-op {per:7.3f} ms")
    return per

def main():
    global RTT
    print(jax.devices())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))

    # measure RTT baseline: identity chain
    f_id = jax.jit(lambda x: x * 1.0000001)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        s = float(jnp.max(jnp.ravel(f_id(img))[:1]))
        ts.append((time.perf_counter() - t0) * 1e3)
    RTT = np.median(ts)
    print(f"readback RTT baseline: {RTT:.2f} ms")

    chain_time("noop chain (sanity ~0)", f_id, img)

    k7 = jnp.asarray(np.exp(-0.5 * ((np.arange(7) - 3) / 2.0) ** 2).astype(np.float32)); k7 = k7 / k7.sum()
    def blur_shift(im):
        xp = jnp.pad(im, ((0, 0), (3, 3)), mode="reflect")
        acc = jnp.zeros_like(im)
        for i in range(7):
            acc = acc + k7[i] * jax.lax.dynamic_slice_in_dim(xp, i, W, axis=1)
        yp = jnp.pad(acc, ((3, 3), (0, 0)), mode="reflect")
        acc2 = jnp.zeros_like(im)
        for i in range(7):
            acc2 = acc2 + k7[i] * jax.lax.dynamic_slice_in_dim(yp, i, H, axis=0)
        return acc2
    chain_time("blur7 shift-add [376,1241]", jax.jit(blur_shift), img)

    def blur_conv(im):
        x = jnp.pad(im, ((0, 0), (3, 3)), mode="reflect")
        x = jax.lax.conv_general_dilated(x[None, None], k7[None, None, None, :], (1, 1), "VALID")[0, 0]
        x = jnp.pad(x, ((3, 3), (0, 0)), mode="reflect")
        x = jax.lax.conv_general_dilated(x[None, None], k7[None, None, :, None], (1, 1), "VALID")[0, 0]
        return x
    chain_time("blur7 conv 1chan [376,1241]", jax.jit(blur_conv), img)

    def fast_ring(im):
        p = jnp.pad(im, 3)
        offs = [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
                (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)]
        ring = jnp.stack([jax.lax.dynamic_slice(p, (3 + dy, 3 + dx), (H, W)) for dy, dx in offs])
        d = ring - im[None]
        dd = jnp.concatenate([d, d[:8]], axis=0)
        m = dd
        m = jnp.minimum(m[:-1], m[1:]); m = jnp.minimum(m[:-2], m[2:]); m = jnp.minimum(m[:-4], m[4:])
        bright = jnp.minimum(m[:16], dd[8:24])
        M = dd
        M = jnp.maximum(M[:-1], M[1:]); M = jnp.maximum(M[:-2], M[2:]); M = jnp.maximum(M[:-4], M[4:])
        dark = jnp.maximum(M[:16], dd[8:24])
        sc = jnp.maximum(jnp.maximum(jnp.max(bright, 0), -jnp.min(dark, 0)) - 7.0, 0.0)
        return sc
    chain_time("fast score map [376,1241]", jax.jit(fast_ring), img)

    def nms(im):
        n = jax.lax.reduce_window(im, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
        return jnp.where(im >= n, im, 0.0)
    chain_time("nms reduce_window", jax.jit(nms), img)

    def nms_shift(im):
        p = jnp.pad(im, 1, constant_values=-jnp.inf)
        m = im
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                m = jnp.maximum(m, jax.lax.dynamic_slice(p, (dy, dx), (H, W)))
        return jnp.where(im >= m, im, 0.0)
    chain_time("nms shift-max", jax.jit(nms_shift), img)

    # matmuls
    big = jnp.asarray(rng.normal(size=(2048, 2048)).astype(np.float32))
    chain_time("f32 matmul 2048^3", jax.jit(lambda a: a @ big), big)
    bits = jnp.asarray(rng.integers(0, 2, size=(2048, 256)).astype(np.int8))
    def i8mm(b):
        d = jax.lax.dot_general(b, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        return (b + (d[:, :256] % 2).astype(jnp.int8) * 0).astype(jnp.int8)
    chain_time("int8 2048x256x2048 hamming", jax.jit(i8mm), bits)

    # top_k sizes
    keys = jnp.asarray(rng.integers(0, 1 << 30, size=(131072,)).astype(np.int32))
    def tk(k):
        v, i = jax.lax.top_k(k, 8192)
        return k.at[:8192].set(v)
    chain_time("top_k 8192 of 131072", jax.jit(tk), keys)

    def tk2(k):
        v, i = jax.lax.top_k(k.reshape(16, 8192), 512)
        return k.at[:8192].set(v.reshape(-1))
    chain_time("blocked top_k 16x(512 of 8192)", jax.jit(tk2), keys)

    # gathers
    flat_idx = jnp.asarray(rng.integers(0, H * W, size=(2048, 512)).astype(np.int32))
    def g1(im):
        v = im.reshape(-1)[flat_idx]
        return im.at[:300, :512].add(v[:300] * 1e-9)
    chain_time("flat gather [2048,512]", jax.jit(g1), img)

    idx2y = jnp.asarray(rng.integers(0, H, size=(2048, 512)).astype(np.int32))
    idx2x = jnp.asarray(rng.integers(0, W, size=(2048, 512)).astype(np.int32))
    def g2(im):
        v = im[idx2y, idx2x]
        return im.at[:300, :512].add(v[:300] * 1e-9)
    chain_time("2d adv-index gather [2048,512]", jax.jit(g2), img)

    # pose-opt style: 4 rounds x 10 iters of 6x6 solve with [2048] residuals
    X = jnp.asarray(rng.normal(size=(2048, 3)).astype(np.float32))
    def tiny_lm(im):
        T = jnp.eye(4) + im[:4, :4] * 1e-12
        def it(c, _):
            Tc, = c
            p = X @ Tc[:3, :3].T + Tc[:3, 3]
            r = p[:, :2] / jnp.maximum(p[:, 2:3], 1e-6)
            J = jnp.concatenate([X, jnp.ones((2048, 1)), r, jnp.ones((2048, 1))], 1)[:, :6]
            Hm = J.T @ J
            g = J.T @ r[:, 0]
            d = jnp.linalg.solve(Hm + jnp.eye(6), g)
            Tc = Tc.at[:3, 3].add(d[:3] * 1e-9)
            return (Tc,), None
        (Tf,), _ = jax.lax.scan(it, (T,), None, length=40)
        return im.at[:4, :4].add(Tf * 1e-12)
    chain_time("pose-opt-ish 40 iters scan", jax.jit(tiny_lm), img)

    # image resize via matmul
    h2, w2 = 313, 1034
    def rmat(n_out, n_in):
        x = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
        i0 = np.clip(np.floor(x).astype(np.int32), 0, n_in - 1)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        f = np.clip(x - i0, 0, 1).astype(np.float32)
        Rm = np.zeros((n_out, n_in), np.float32)
        Rm[np.arange(n_out), i0] += 1 - f
        Rm[np.arange(n_out), i1] += f
        return jnp.asarray(Rm)
    Ry, Rx = rmat(h2, H), rmat(w2, W)
    def rsz(im):
        small = Ry @ im @ Rx.T
        return im.at[:h2, :w2].add(small * 1e-12)
    chain_time("matmul resize to L1", jax.jit(rsz), img)

    def rsz2(im):
        small = jax.image.resize(im, (h2, w2), "bilinear")
        return im.at[:h2, :w2].add(small * 1e-12)
    chain_time("jax.image.resize to L1", jax.jit(rsz2), img)

if __name__ == "__main__":
    main()
