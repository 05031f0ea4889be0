"""Measure per-program dispatch overhead on the axon TPU relay."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

def timeit(name, fn, reps=20):
    fn(); jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = sorted(ts)
    print(f"{name:45s} med {np.median(ts):8.3f} ms  min {ts[0]:8.3f}  max {ts[-1]:8.3f}")

def main():
    print(jax.devices())
    x = jnp.ones((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    timeit("tiny add [8,128]", lambda: f_tiny(x))

    f_scalar = jax.jit(lambda x: jnp.sum(x))
    timeit("sum -> scalar", lambda: f_scalar(x))

    big = jnp.ones((2048, 2048), jnp.float32)
    f_mm = jax.jit(lambda a: a @ a)
    timeit("f32 matmul 2048^3 (17 GFLOP)", lambda: f_mm(big))

    bits = jnp.ones((2048, 256), jnp.int8)
    f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32))
    timeit("int8 matmul 2048x256x2048", lambda: f_i8(bits, bits))

    # pipelining: 10 dispatches then one block
    def ten():
        y = x
        for _ in range(10):
            y = f_tiny(y)
        return y
    timeit("10x tiny add, one block", lambda: ten())

    # chained 10 matmuls
    def tenmm():
        y = big
        for _ in range(10):
            y = f_mm(y)
        return y
    timeit("10x matmul 2048^3, one block", lambda: tenmm())

    # host->device transfer of a KITTI image
    img_np = np.ones((376, 1241), np.float32)
    timeit("device_put 1.8MB image", lambda: jax.device_put(img_np))

    # device->host of a scalar (the int() sync pattern)
    s = f_scalar(x)
    timeit("scalar device->host int()", lambda: int(s))

    n = jnp.int32(5)
    f_n = jax.jit(lambda: jnp.int32(7))
    nn = f_n()
    timeit("int(device scalar) fresh", lambda: int(f_scalar(big)))

if __name__ == "__main__":
    main()
