"""Micro-benchmarks of candidate TPU primitives for the ORB front end.

Measures on the real chip:
  - flat 1-D gather of 1M samples from an image
  - batched take_along_axis gather ([K, 1600] -> [K, 512])
  - vmapped dynamic_slice patch extraction (K x 40x40)
  - one-hot matmul row extraction
  - separable blur: conv_general vs shift-add
  - resize: jax.image.resize vs matmul resize
  - reduce_window NMS
  - int8 hamming matmul 2048x2048 (reference point)
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

H, W = 376, 1241
K = 2048


def timeit(name, fn, reps=10):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:45s} {np.median(ts):8.3f} ms")


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    flat_idx = jnp.asarray(rng.integers(0, H * W, size=(K, 512)).astype(np.int32))
    ys = jnp.asarray(rng.integers(20, H - 60, size=(K,)).astype(np.int32))
    xs = jnp.asarray(rng.integers(20, W - 60, size=(K,)).astype(np.int32))
    patch_idx = jnp.asarray(rng.integers(0, 1600, size=(K, 512)).astype(np.int32))

    f1 = jax.jit(lambda im, idx: im.reshape(-1)[idx])
    timeit("flat gather [K,512] from image", lambda: f1(img, flat_idx))

    f1b = jax.jit(lambda im, idx: im.reshape(-1)[idx])
    big_idx = jnp.asarray(rng.integers(0, H * W, size=(K, 1600)).astype(np.int32))
    timeit("flat gather [K,1600] from image", lambda: f1b(img, big_idx))

    def dslice(im, ys, xs):
        return jax.vmap(lambda y, x: jax.lax.dynamic_slice(im, (y, x), (40, 40)))(ys, xs)
    f2 = jax.jit(dslice)
    timeit("vmap dynamic_slice 40x40 patches", lambda: f2(img, ys, xs))

    patches = f2(img, ys, xs).reshape(K, 1600)
    f3 = jax.jit(lambda p, idx: jnp.take_along_axis(p, idx, axis=1))
    timeit("take_along_axis [K,1600]->[K,512]", lambda: f3(patches, patch_idx))

    def onehot_rows(im, ys):
        oh = (ys[:, None] == jnp.arange(H)[None, :]).astype(jnp.bfloat16)
        return jnp.dot(oh, im.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    f4 = jax.jit(onehot_rows)
    timeit("one-hot matmul row extract [K,H]@[H,W]", lambda: f4(img, ys))

    # separable blur variants
    k7 = jnp.asarray(np.exp(-0.5 * ((np.arange(7) - 3) / 2.0) ** 2).astype(np.float32))
    k7 = k7 / k7.sum()

    def blur_conv(im):
        x = jnp.pad(im, ((0, 0), (3, 3)), mode="reflect")
        x = jax.lax.conv_general_dilated(x[None, None], k7[None, None, None, :], (1, 1), "VALID")[0, 0]
        x = jnp.pad(x, ((3, 3), (0, 0)), mode="reflect")
        x = jax.lax.conv_general_dilated(x[None, None], k7[None, None, :, None], (1, 1), "VALID")[0, 0]
        return x
    timeit("blur 7x7 conv_general (1chan)", lambda: jax.jit(blur_conv)(img))

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
    timeit("blur 7x7 shift-add", lambda: jax.jit(blur_shift)(img))

    # resize variants: H,W -> 313,1034
    h2, w2 = 313, 1034
    timeit("jax.image.resize bilinear", lambda: jax.jit(
        lambda im: jax.image.resize(im, (h2, w2), "bilinear"))(img))

    def resize_mat(n_out, n_in):
        x = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
        i0 = np.clip(np.floor(x).astype(np.int32), 0, n_in - 1)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        f = np.clip(x - i0, 0.0, 1.0).astype(np.float32)
        Rm = np.zeros((n_out, n_in), np.float32)
        Rm[np.arange(n_out), i0] += 1 - f
        Rm[np.arange(n_out), i1] += f
        return jnp.asarray(Rm)
    Ry, Rx = resize_mat(h2, H), resize_mat(w2, W)
    timeit("matmul resize Ry@img@Rx^T", lambda: jax.jit(
        lambda im: Ry @ im @ Rx.T)(img))

    # NMS
    timeit("reduce_window 3x3 max", lambda: jax.jit(
        lambda s: jax.lax.reduce_window(s, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"))(img))

    # 16 rolls (FAST ring) vs padded slices
    def rolls(im):
        return sum(jnp.roll(im, (dy, dx), (0, 1)) for dy, dx in
                   [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
                    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)])
    timeit("16x jnp.roll", lambda: jax.jit(rolls)(img))

    def slices(im):
        p = jnp.pad(im, 3)
        return sum(jax.lax.dynamic_slice(p, (3 + dy, 3 + dx), (H, W)) for dy, dx in
                   [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
                    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)])
    timeit("16x padded static slice", lambda: jax.jit(slices)(img))

    # hamming matmul reference
    bits = jnp.asarray(rng.integers(0, 2, size=(2048, 256)).astype(np.int8))
    f5 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32))
    timeit("int8 matmul 2048x256x2048", lambda: f5(bits, bits))

    big = jnp.asarray(rng.integers(0, 2, size=(8192, 256)).astype(np.int8))
    timeit("int8 matmul 8192x256x2048", lambda: f5(big, bits))

    # top_k over 131072 (covis compaction cost)
    keys = jnp.asarray(rng.integers(0, 1 << 30, size=(131072,)).astype(np.int32))
    timeit("top_k 8192 of 131072", lambda: jax.jit(
        lambda k: jax.lax.top_k(k, 8192))(keys))

    # median of 2048 (stereo outlier cut)
    vals = jnp.asarray(rng.normal(size=(2048,)).astype(np.float32))
    timeit("nanmedian 2048", lambda: jax.jit(jnp.nanmedian)(vals))

    # scatter .at[].set of full KF row into [2048,2048,32] u8
    desc = jnp.zeros((2048, 2048, 32), jnp.uint8)
    row = jnp.asarray(rng.integers(0, 255, size=(2048, 32)).astype(np.uint8))
    f6 = jax.jit(lambda d, r: d.at[5].set(r), donate_argnums=0)
    timeit("scatter one KF desc row (donated)", lambda: f6(jnp.zeros((2048, 2048, 32), jnp.uint8), row))


if __name__ == "__main__":
    main()
