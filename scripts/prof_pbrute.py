"""Component timing: kernel A vs kernel B vs hash vs XLA compaction."""
import time

import os

import jax
import jax.numpy as jnp
import numpy as np

from keyhuntm1cpu_tpu.curve import pbrute, pwalk, tables
from keyhuntm1cpu_tpu.field import fe
from keyhuntm1cpu_tpu.ref import ecref

import jax as _j
_j.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
U, K, SB, T = 8192, 64, 4, 32
print(f"U={U} K={K} SB={SB} T={T}")

pt = ecref.scalar_mult(12345)
px = jnp.asarray(fe.int_to_limbs(pt[0]))
py = jnp.asarray(fe.int_to_limbs(pt[1]))
tab_x, tab_y = tables.step_table(ecref.G, U)
txl = pwalk.table_to_limb_major(tab_x)
tyl = pwalk.table_to_limb_major(tab_y)
adv = ecref.scalar_mult(U)
ax = jnp.asarray(fe.int_to_limbs(adv[0]))
ay = jnp.asarray(fe.int_to_limbs(adv[1]))
tgt = jnp.asarray(
    np.arange(2 * T, dtype=np.uint32).reshape(2, T) + 0x9999
)

rep = lambda v: jnp.broadcast_to(v[:, None, None], (8, 1, 128))


@jax.jit
def kernel_a(px, py, ax, ay):
    return pwalk.advance_chain(rep(px), rep(py), rep(ax), rep(ay), K)


@jax.jit
def kernel_b_xonly(bx, by, txl, tyl):
    return pwalk.walk_blocks(bx, by, txl, tyl, U, SB=SB)


import functools


@functools.partial(jax.jit, static_argnames=("mode",))
def kernel_b_brute(bx, by, txl, tyl, tgt, mode):
    return pbrute.brute_walk_blocks(
        bx, by, txl, tyl, tgt, jnp.zeros((8, 128), jnp.uint32), U, SB,
        mode, 1,
    )


@jax.jit
def compact(hits):
    flat = hits.reshape(-1)
    qbits = flat & jnp.uint32((1 << 30) - 1)
    mask = qbits != 0
    n = mask.sum().astype(jnp.int32)
    (pos,) = jnp.nonzero(mask, size=1024, fill_value=K * U)
    bits = qbits[jnp.minimum(pos.astype(jnp.int32), K * U - 1)]
    deg = ((flat >> 30) & 1).reshape(K, U)
    return pos, bits, n, deg.sum(axis=1), jnp.argmax(deg, axis=1)


def pull(out):
    # force real completion: async dispatch through the axon tunnel makes
    # block_until_ready unreliable; a host pull of one element is not
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(label, fn, *args, n=10):
    out = fn(*args)
    pull(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        pull(out)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms  ({K*U/dt/1e6:.1f}M pts/s)")
    return out


bx, by, nx, ny, adeg = timeit("kernel A (advance chain)", kernel_a, px, py, ax, ay)
timeit("kernel B x-only (pwalk)", kernel_b_xonly, bx, by, txl, tyl)
hits = timeit("kernel B fused xpoint", kernel_b_brute, bx, by, txl, tyl, tgt, "xpoint")
timeit("kernel B fused rmd160", kernel_b_brute, bx, by, txl, tyl, tgt, "rmd160")
timeit("XLA compaction", compact, hits)


def timeit_pipelined(label, fn, *args, n=40):
    out = fn(*args)
    pull(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    pull(outs[-1])  # device queue is serial: one pull drains all n
    dt = (time.time() - t0) / n
    print(f"{label} [pipelined]: {dt*1e3:.2f} ms  ({K*U/dt/1e6:.1f}M pts/s)")


timeit_pipelined("kernel A", kernel_a, px, py, ax, ay)
timeit_pipelined("kernel B x-only", kernel_b_xonly, bx, by, txl, tyl)
timeit_pipelined("kernel B fused xpoint", kernel_b_brute, bx, by, txl, tyl, tgt, "xpoint")
timeit_pipelined("kernel B fused rmd160", kernel_b_brute, bx, by, txl, tyl, tgt, "rmd160")
timeit_pipelined("kernel B fused eth", kernel_b_brute, bx, by, txl, tyl, tgt, "eth")
timeit_pipelined("XLA compaction", compact, hits)
