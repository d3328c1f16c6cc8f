"""Limb-major field arithmetic for Pallas TPU kernels.

Representation: a batch of field elements is a uint32 array shaped
``(8,) + tile`` — limb axis LEADING, so ``a[i]`` is one limb of the whole
tile and occupies fully-packed (sublane, lane) vregs. This is the in-kernel
dual of field/fe.py's ``(..., 8)`` host layout (limb axis trailing, right
for XLA batching; wrong inside a kernel where the minor axis must be the
128-lane dim).

Everything here is plain jnp on values (not refs), usable both inside
pallas kernels and in interpret/XLA mode; loops are python-unrolled over
the 8 limbs / 16 half-limbs, which Mosaic schedules as straight-line
vector code. Same algebra as fe.py: 16-bit half-limb schoolbook products,
two uncarried folds of 2^256 ≡ 2^32 + 0x3D1 (reference ModMulK1 identity,
secp256k1/IntMod.cpp:855-915), one 8-step carry chain, conditional
subtract.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

P_INT = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
MASK16 = 0xFFFF
FOLD = 0x3D1


def zeros_like_tile(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.zeros_like(a[0])


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod p. a, b: (8,) + tile uint32."""
    al, bl = [], []
    for i in range(8):
        al += [a[i] & MASK16, a[i] >> 16]
        bl += [b[i] & MASK16, b[i] >> 16]
    return _reduce(_school_cols(al, bl))


def sqr(a: jnp.ndarray) -> jnp.ndarray:
    """(a * a) mod p — off-diagonal products computed once and doubled
    (saves ~45% of the 256 lane-multiplies vs mul)."""
    al = []
    for i in range(8):
        al += [a[i] & MASK16, a[i] >> 16]
    zero = jnp.zeros_like(al[0])
    cols = [zero] * 33
    for i in range(16):
        sq = al[i] * al[i]
        cols[2 * i] = cols[2 * i] + (sq & MASK16)
        cols[2 * i + 1] = cols[2 * i + 1] + (sq >> 16)
        for j in range(i + 1, 16):
            prod = al[i] * al[j]
            # 2*prod can overflow u32; split first, double the halves
            lo2 = (prod & MASK16) << 1  # < 2^17
            hi2 = (prod >> 16) << 1
            cols[i + j] = cols[i + j] + lo2
            cols[i + j + 1] = cols[i + j + 1] + hi2
    return _reduce(cols)


def _school_cols(al: List[jnp.ndarray], bl: List[jnp.ndarray]) -> List[jnp.ndarray]:
    zero = jnp.zeros_like(al[0])
    cols = [zero] * 33
    for i in range(16):
        for j in range(16):
            prod = al[i] * bl[j]
            cols[i + j] = cols[i + j] + (prod & MASK16)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> 16)
    return cols


def _reduce(cols: List[jnp.ndarray]) -> jnp.ndarray:
    """33 uncarried 16-bit columns (< 2^22 each) -> canonical (8,)+tile.

    Column bounds: schoolbook sums <= 512*2^16 < 2^22 (sqr's doubled
    halves stay < 2^17, 32 of them < 2^22). After fold 1: < 2^23.
    After fold 2: < 2^24. All fit u32 with room."""
    zero = jnp.zeros_like(cols[0])
    # fold 1: cols[16..32] * (2^32 + 0x3D1) into cols[0..18]
    low = cols[:16] + [zero, zero, zero]
    for i, h in enumerate(cols[16:]):
        hp = h * FOLD  # < 2^22 * 2^10 = 2^32 — u32 wrap impossible at <2^22·0x3D1 < 2^32
        low[i] = low[i] + (hp & MASK16)
        low[i + 1] = low[i + 1] + (hp >> 16)
        low[i + 2] = low[i + 2] + h
    # fold 2: cols[16..18]
    high = low[16:]
    low = low[:16]
    for i, h in enumerate(high):
        hp = h * FOLD
        low[i] = low[i] + (hp & MASK16)
        low[i + 1] = low[i + 1] + (hp >> 16)
        low[i + 2] = low[i + 2] + h
    # carry into 8 u32 limbs
    limbs = []
    carry = zero
    for i in range(8):
        lo = low[2 * i] + carry
        hi = low[2 * i + 1] + (lo >> 16)
        limbs.append((lo & MASK16) | (hi << 16))
        carry = hi >> 16
    # micro-fold the final carry (< 2^9): + carry * (2^32 + 0x3D1)
    r = []
    t = limbs[0] + carry * FOLD
    c = (t < limbs[0]).astype(jnp.uint32)
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
    # conditional subtract p. NOTE: p's 0xFFFFFFFF limbs crash the Mosaic
    # LLO lowering as constants (sign-extended to -1), so use the identity
    # r - p ≡ r + 0x1000003D1 (mod 2^256); carry-out <=> r >= p.
    d, cc = _add_neg_p(r)
    take = (c == 1) | (cc == 1)
    return jnp.stack([jnp.where(take, d[i], r[i]) for i in range(8)])


def _add_neg_p(r: List[jnp.ndarray]) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """r + (2^256 - p) = r + 0x1000003D1 over 8 limbs -> (sum, carry_out).
    carry_out == 1 iff r >= p (mod-2^256 wrap = the subtraction r - p)."""
    d = []
    t = r[0] + FOLD
    c = (t < r[0]).astype(jnp.uint32)
    d.append(t)
    t1 = r[1] + 1
    c1 = (t1 == 0).astype(jnp.uint32)
    t = t1 + c
    c2 = (t < c).astype(jnp.uint32)
    d.append(t)
    c = c1 | c2
    for i in range(2, 8):
        t = r[i] + c
        c = (t < c).astype(jnp.uint32)
        d.append(t)
    return d, c


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for canonical inputs."""
    s, carry = _add_raw(a, b)
    d, cc = _add_neg_p(s)
    take = (carry == 1) | (cc == 1)
    return jnp.stack([jnp.where(take, d[i], s[i]) for i in range(8)])


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for canonical inputs."""
    out, borrow = [], jnp.zeros_like(a[0])
    for i in range(8):
        t = a[i] - b[i]
        b1 = (a[i] < b[i]).astype(jnp.uint32)
        s = t - borrow
        b2 = (t < borrow).astype(jnp.uint32)
        out.append(s)
        borrow = b1 | b2
    # on borrow the mod-2^256 wrap added 2^256; adding p back equals
    # subtracting (2^256 - p) = 0x1000003D1 (small constants only —
    # p's 0xFFFFFFFF limbs crash Mosaic constant lowering)
    adj, bw = [], jnp.zeros_like(a[0])
    t = out[0] - FOLD
    bw = (out[0] < FOLD).astype(jnp.uint32)
    adj.append(t)
    t1 = out[1] - 1
    b1 = (out[1] == 0).astype(jnp.uint32)
    t = t1 - bw
    b2 = (t1 < bw).astype(jnp.uint32)
    adj.append(t)
    bw = b1 | b2
    for i in range(2, 8):
        t = out[i] - bw
        bw = (out[i] < bw).astype(jnp.uint32)
        adj.append(t)
    take = borrow == 1
    return jnp.stack([jnp.where(take, adj[i], out[i]) for i in range(8)])


def _add_raw(a, b) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    out, carry = [], jnp.zeros_like(a[0])
    for i in range(8):
        t = a[i] + carry
        c1 = (t < carry).astype(jnp.uint32)
        s = t + b[i]
        c2 = (s < t).astype(jnp.uint32)
        out.append(s)
        carry = c1 | c2
    return out, carry


def dbl(a: jnp.ndarray) -> jnp.ndarray:
    return add(a, a)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p; maps 0 -> 0 (sub handles the borrow-free zero case)."""
    return sub(jnp.zeros_like(a), a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    acc = a[0]
    for i in range(1, 8):
        acc = acc | a[i]
    return acc == 0


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    acc = a[0] ^ b[0]
    for i in range(1, 8):
        acc = acc | (a[i] ^ b[i])
    return acc == 0


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(mask, a, b): mask shaped tile, operands (8,)+tile."""
    return jnp.stack([jnp.where(mask, a[i], b[i]) for i in range(8)])


def one_like(a: jnp.ndarray) -> jnp.ndarray:
    # no .at[].set — scatter has no Pallas TPU lowering
    z = jnp.zeros_like(a[0])
    return jnp.stack([z + 1] + [z] * 7)


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2) via the standard secp256k1 addition chain: 255 squarings +
    15 multiplies (vs ~509 ops for a naive MSB ladder). Branch-free;
    maps 0 -> 0. Verified against pow(a, p-2, p) in tests.

    Squaring runs are fori_loops so the traced body stays ~30 mul-sized —
    a fully unrolled chain is ~300 mul bodies, which blows Mosaic compile
    time (minutes) and crashes its lowering past ~500 bodies
    (lower_to_llo.cc 32-bit offset check)."""

    def sqr_n(x, n):
        if n <= 2:
            for _ in range(n):
                x = sqr(x)
            return x
        return jax.lax.fori_loop(0, n, lambda i, v: sqr(v), x)

    x1 = a
    x2 = mul(sqr_n(x1, 1), x1)  # 2^2 - 1
    x3 = mul(sqr_n(x2, 1), x1)  # 2^3 - 1
    x6 = mul(sqr_n(x3, 3), x3)
    x9 = mul(sqr_n(x6, 3), x3)
    x11 = mul(sqr_n(x9, 2), x2)
    x22 = mul(sqr_n(x11, 11), x11)
    x44 = mul(sqr_n(x22, 22), x22)
    x88 = mul(sqr_n(x44, 44), x44)
    x176 = mul(sqr_n(x88, 88), x88)
    x220 = mul(sqr_n(x176, 44), x44)
    x223 = mul(sqr_n(x220, 3), x3)
    # tail: p - 2 = (2^223 - 1)*2^33 + 0x1_FFFFFC2D
    t = mul(sqr_n(x223, 23), x22)
    t = mul(sqr_n(t, 5), x1)
    t = mul(sqr_n(t, 3), x2)
    t = mul(sqr_n(t, 2), x1)
    return t


def montgomery_inv_groups(dens: jnp.ndarray, n_groups: int) -> jnp.ndarray:
    """Batched inverse of (8, G*S, L) denominators via group chains.

    View the tile rows as n_groups chained groups (each group a full
    (S, L) vreg set): forward prefix products over groups, ONE addition-
    chain inversion of the last prefix (group-width), backward peel.
    Amortized ~3 muls/element + inv()/n_groups. Zero denominators must be
    masked to 1 by the caller (flagged lanes)."""
    rows = dens.shape[1]
    s = rows // n_groups
    groups = [dens[:, g * s : (g + 1) * s] for g in range(n_groups)]
    prefixes = [groups[0]]
    for g in range(1, n_groups):
        prefixes.append(mul(prefixes[-1], groups[g]))
    running = inv(prefixes[-1])
    invs: List[jnp.ndarray] = [None] * n_groups  # type: ignore[list-item]
    for g in range(n_groups - 1, 0, -1):
        invs[g] = mul(running, prefixes[g - 1])
        running = mul(running, groups[g])
    invs[0] = running
    return jnp.concatenate(invs, axis=1)


# -- host-layout conversion helpers (callers/tests) -------------------------


def to_tiles(a_bm: jnp.ndarray, lanes: int = 128) -> jnp.ndarray:
    """(B, 8) batch-major -> (8, B/lanes, lanes) limb-major."""
    b = a_bm.shape[0]
    return jnp.transpose(a_bm, (1, 0)).reshape(8, b // lanes, lanes)


def from_tiles(a_lm: jnp.ndarray) -> jnp.ndarray:
    """(8, S, lanes) -> (S*lanes, 8)."""
    return jnp.transpose(a_lm.reshape(8, -1), (1, 0))
