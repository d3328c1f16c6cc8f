"""Single-chip microbenchmarks of the core kernels (run on real TPU).

Usage: python scripts/micro_bench.py [mul|inv|walk|hash|all]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def bench_mul(B=1 << 20):
    from keyhuntm1cpu_tpu.field import fe

    rng = np.random.default_rng(1)
    mask = np.array([0xFFFFFFFF] * 7 + [0x0FFFFFFF], dtype=np.uint32)
    a = jnp.asarray(rng.integers(0, 2**32, size=(B, 8), dtype=np.uint32) & mask)
    b = jnp.asarray(rng.integers(0, 2**32, size=(B, 8), dtype=np.uint32) & mask)
    mul = jax.jit(fe.mul_mod_p)
    t0 = time.time()
    out = mul(a, b)
    out.block_until_ready()
    log(f"mul compile+run {time.time()-t0:.1f}s (B={B})")
    n = 30
    t0 = time.time()
    for _ in range(n):
        out = mul(out, b)
    out.block_until_ready()
    dt = time.time() - t0
    log(f"mul: {n*B/dt:.3e} modmul/s ({dt/n*1e3:.2f} ms per batch)")


def bench_inv(B=1 << 18):
    from keyhuntm1cpu_tpu.field import fe

    rng = np.random.default_rng(2)
    mask = np.array([0xFFFFFFFF] * 7 + [0x0FFFFFFF], dtype=np.uint32)
    a = jnp.asarray(rng.integers(1, 2**32, size=(B, 8), dtype=np.uint32) & mask)
    binv = jax.jit(lambda x: fe.batch_inv_mod_p(x, chain_len=64))
    t0 = time.time()
    out = binv(a)
    out.block_until_ready()
    log(f"batchinv compile+run {time.time()-t0:.1f}s (B={B})")
    n = 10
    t0 = time.time()
    for _ in range(n):
        out = binv(out)
    out.block_until_ready()
    dt = time.time() - t0
    log(f"batchinv: {n*B/dt:.3e} inv/s")


def bench_walk(T=1, U=8192):
    from keyhuntm1cpu_tpu.curve import points, tables, walk
    from keyhuntm1cpu_tpu.ref import ecref

    tbx, tby = tables.step_table(ecref.G, U)
    ctr = points.point_batch_from_ints([ecref.scalar_mult(10**9 + t) for t in range(T)])
    f = jax.jit(
        lambda cx, cy: walk.xonly_walk(
            points.PointBatch(cx, cy, jnp.zeros((T,), bool)),
            jnp.asarray(tbx),
            jnp.asarray(tby),
            symmetric=True,
            chain_len=64,
        ).x_plus
    )
    t0 = time.time()
    out = f(ctr.x, ctr.y)
    out.block_until_ready()
    log(f"walk compile+run {time.time()-t0:.1f}s (T={T}, U={U})")
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = f(ctr.x, ctr.y)
    out.block_until_ready()
    dt = time.time() - t0
    log(f"walk: {n*T*U*2/dt:.3e} points/s (sym, x-only)")


def bench_hash(B=1 << 18):
    from keyhuntm1cpu_tpu.hash import hash160_from_x_both_parities

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 2**32, size=(B, 8), dtype=np.uint32))
    f = jax.jit(lambda x: hash160_from_x_both_parities(x))
    t0 = time.time()
    out = f(x)
    jax.block_until_ready(out)
    log(f"hash160x2 compile+run {time.time()-t0:.1f}s (B={B})")
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = f(x)
    jax.block_until_ready(out)
    dt = time.time() - t0
    log(f"hash160: {n*B*2/dt:.3e} hash160/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(jax.devices())
    if which in ("mul", "all"):
        bench_mul()
    if which in ("inv", "all"):
        bench_inv()
    if which in ("walk", "all"):
        bench_walk()
    if which in ("hash", "all"):
        bench_hash()
