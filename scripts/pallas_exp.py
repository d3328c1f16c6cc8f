"""Pallas experiment: limb-major 256-bit modmul kernel vs the XLA path.

Layout: batch as (8, NB, 128) uint32 — limb-major, so limb i of a whole
128-lane x S-sublane tile is one fully-occupied vreg set. Run on TPU:

    python scripts/pallas_exp.py [B_log2] [S]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keyhuntm1cpu_tpu.field import fe

P_INT = fe.P_INT
MASK16 = 0xFFFF
FOLD = 0x3D1


def _mul_mod_tiles(a, b):
    """a, b: lists of 8 (S, 128) u32 tiles (limb-major). Returns 8 tiles."""
    al, bl = [], []
    for i in range(8):
        al += [a[i] & MASK16, a[i] >> 16]
        bl += [b[i] & MASK16, b[i] >> 16]
    zero = jnp.zeros_like(a[0])
    cols = [zero] * 33
    for i in range(16):
        for j in range(16):
            prod = al[i] * bl[j]
            cols[i + j] = cols[i + j] + (prod & MASK16)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> 16)
    # fold 1: cols 16..32 -> low16 + c*(2^32 + 0x3D1); columns < 2^22
    low = cols[:16]
    high = cols[16:]
    out = low + [zero, zero, zero]
    for i, h in enumerate(high):
        hp = h * FOLD
        out[i] = out[i] + (hp & MASK16)
        out[i + 1] = out[i + 1] + (hp >> 16)
        out[i + 2] = out[i + 2] + h
    # fold 2: cols 16..18
    low = out[:16]
    high = out[16:]
    for i, h in enumerate(high):
        hp = h * FOLD
        low[i] = low[i] + (hp & MASK16)
        low[i + 1] = low[i + 1] + (hp >> 16)
        low[i + 2] = low[i + 2] + h
    # carry the 16 16-bit columns into 8 u32 limbs; columns < 2^23
    limbs = []
    carry = zero
    for i in range(8):
        lo = low[2 * i] + carry  # < 2^24
        hi = low[2 * i + 1] + (lo >> 16)
        limbs.append((lo & MASK16) | (hi << 16))
        carry = hi >> 16
    # final micro-fold of carry (< 2^9): add carry*(2^32 + 0x3D1)
    f0 = carry * FOLD
    r = []
    t = limbs[0] + f0
    c = (t < f0).astype(jnp.uint32)
    r.append(t)
    t1 = limbs[1] + carry
    c1 = (t1 < carry).astype(jnp.uint32)
    t = t1 + c
    c2 = (t < c).astype(jnp.uint32)
    c = c1 | c2
    r.append(t)
    for i in range(2, 8):
        t = limbs[i] + c
        c = (t < c).astype(jnp.uint32)
        r.append(t)
    # conditional subtract p if >= p (or if the add overflowed 2^256)
    pl_ = [np.uint32((P_INT >> (32 * i)) & 0xFFFFFFFF) for i in range(8)]
    d, bw = [], zero
    for i in range(8):
        t = r[i] - pl_[i]
        b1 = (r[i] < pl_[i]).astype(jnp.uint32)
        s = t - bw
        b2 = (t < bw).astype(jnp.uint32)
        d.append(s)
        bw = b1 | b2
    take = (c == 1) | (bw == 0)
    return [jnp.where(take, d[i], r[i]) for i in range(8)]


def make_mul(S):
    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(8)]
        b = [b_ref[i] for i in range(8)]
        out = _mul_mod_tiles(a, b)
        for i in range(8):
            o_ref[i] = out[i]

    def mul(a, b):
        # a, b: (8, NB, 128)
        nb = a.shape[1]
        grid = (nb // S,)
        spec = pl.BlockSpec((8, S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
        )(a, b)

    return mul


def main():
    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B = 1 << blog
    nb = B // 128
    rng = np.random.default_rng(0)
    a_bm = rng.integers(0, 2**32, size=(B, 8), dtype=np.uint32)
    a_bm[:, 7] &= 0x0FFFFFFF
    b_bm = rng.integers(0, 2**32, size=(B, 8), dtype=np.uint32)
    b_bm[:, 7] &= 0x0FFFFFFF

    # limb-major (8, NB, 128)
    a_lm = jnp.asarray(a_bm.T.reshape(8, nb, 128))
    b_lm = jnp.asarray(b_bm.T.reshape(8, nb, 128))

    mul = jax.jit(make_mul(S))
    t0 = time.time()
    out = mul(a_lm, b_lm)
    out.block_until_ready()
    print(f"pallas mul compile+run {time.time()-t0:.1f}s (B={B}, S={S})")

    # correctness vs python ints on a sample
    out_np = np.asarray(out).reshape(8, B)[:, :64]
    for k in range(8):
        av = sum(int(a_bm[k, i]) << (32 * i) for i in range(8))
        bv = sum(int(b_bm[k, i]) << (32 * i) for i in range(8))
        want = av * bv % P_INT
        got = sum(int(out_np[i, k]) << (32 * i) for i in range(8))
        assert got == want, f"mismatch at {k}: {got:x} != {want:x}"
    print("correct on sample")

    n = 30
    t0 = time.time()
    o = out
    for _ in range(n):
        o = mul(o, b_lm)
    o.block_until_ready()
    dt = time.time() - t0
    print(f"pallas mul: {n*B/dt:.3e} modmul/s ({dt/n*1e3:.2f} ms/batch)")


if __name__ == "__main__":
    main()
