"""Pallas fused hash160 (sha256 -> ripemd160), both parities, limb-major.

The XLA hash pipeline (hash/sha256.py + hash/ripemd160.py) runs its rounds
as lax.scans — ~150 serial HLO steps each paying dispatch overhead. Here
the full double pipeline (two 33-byte sha256 compressions + two ripemd160
compressions) is one straight-line kernel over (8, S, 128) limb-major X
tiles: ~6k cheap vector ops, fully parallel over lanes. Round constants
are python ints (traced as immediates); rotation amounts are compile-time
so no dynamic shifts.

Reference capability: GetHash160_fromX both-parity hashing
(SECP256K1.cpp:746-790), the hot path of keyhunt address/rmd160 modes.
"""

from __future__ import annotations

import functools
import os
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ripemd160 import _IV, _K1, _K2, _R1, _R2, _S1, _S2
from .sha256 import _H0, _K

LANES = 128
SUBLANES = 8
MASK8 = 0xFF


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def _rol(x, n: int):
    return (x << n) | (x >> (32 - n))


def _sha256_compress_unrolled(w: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """One SHA-256 compression, statically unrolled; w: 16 tile words."""
    a, b, c, d, e, f, g, h = [jnp.full_like(w[0], np.uint32(hv)) for hv in _H0]
    wbuf = list(w)
    for i in range(64):
        if i < 16:
            wi = wbuf[i]
        else:
            w15 = wbuf[i - 15]
            w2 = wbuf[i - 2]
            sig0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
            sig1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
            wi = wbuf[i - 16] + sig0 + wbuf[i - 7] + sig1
            wbuf.append(wi)
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + np.uint32(_K[i]) + wi
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    iv = [jnp.full_like(w[0], np.uint32(hv)) for hv in _H0]
    return [x + y for x, y in zip([a, b, c, d, e, f, g, h], iv)]


def _bswap(x):
    return (
        ((x & MASK8) << 24)
        | ((x & 0xFF00) << 8)
        | ((x >> 8) & 0xFF00)
        | (x >> 24)
    )


def _ripemd160_32_unrolled(sha_be: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """RIPEMD-160 of the 32-byte sha digest (8 BE tile words), unrolled."""
    zero = jnp.zeros_like(sha_be[0])
    x = [_bswap(wd) for wd in sha_be]
    x.append(zero + 0x80)
    x += [zero] * 5
    x.append(zero + 256)
    x.append(zero)

    fns = [
        lambda p, q, r: p ^ q ^ r,
        lambda p, q, r: (p & q) | (~p & r),
        lambda p, q, r: (p | ~q) ^ r,
        lambda p, q, r: (p & r) | (q & ~r),
        lambda p, q, r: p ^ (q | ~r),
    ]
    a1, b1, c1, d1, e1 = [zero + np.uint32(v) for v in _IV]
    a2, b2, c2, d2, e2 = [zero + np.uint32(v) for v in _IV]
    for j in range(80):
        g = j // 16
        t = _rol(a1 + fns[g](b1, c1, d1) + x[_R1[j]] + np.uint32(_K1[g]), _S1[j]) + e1
        a1, e1, d1, c1, b1 = e1, d1, _rol(c1, 10), b1, t
        t = _rol(a2 + fns[4 - g](b2, c2, d2) + x[_R2[j]] + np.uint32(_K2[g]), _S2[j]) + e2
        a2, e2, d2, c2, b2 = e2, d2, _rol(c2, 10), b2, t
    h0, h1, h2, h3, h4 = (np.uint32(v) for v in _IV)
    return [
        h1 + c1 + d2,
        h2 + d1 + e2,
        h3 + e1 + a2,
        h4 + a1 + b2,
        h0 + b1 + c2,
    ]


def _sha_words_from_x(xl: List[jnp.ndarray], prefix: int) -> List[jnp.ndarray]:
    """16 BE schedule words of the 33-byte message [prefix || X_be];
    xl: 8 LE limb tiles (same splicing as hash/sha256.py:86-101)."""
    zero = jnp.zeros_like(xl[0])
    w = [(zero + (prefix << 24)) | (xl[7] >> 8)]
    for k in range(1, 8):
        w.append(((xl[8 - k] & MASK8) << 24) | (xl[7 - k] >> 8))
    w.append(((xl[0] & MASK8) << 24) | (0x80 << 16))
    w += [zero] * 6
    w.append(zero + 33 * 8)
    return w


def hash160_parity_words(xl: List[jnp.ndarray], prefix: int):
    """(lo, hi) 64-bit-truncated hash160 target words of the compressed
    pubkey [prefix || X]; xl: 8 LE limb tiles. Pure tile function — usable
    from any kernel. Target packing: lo = digest bytes 0..3 LE = ripemd
    word 0; hi = word 1."""
    digest = _ripemd160_32_unrolled(
        _sha256_compress_unrolled(_sha_words_from_x(xl, prefix))
    )
    return digest[0], digest[1]


def _hash160x2_kernel(x_ref, le_ref, he_ref, lo_ref, ho_ref):
    xl = [x_ref[i] for i in range(8)]
    for prefix, lref, href in ((2, le_ref, he_ref), (3, lo_ref, ho_ref)):
        lo_w, hi_w = hash160_parity_words(xl, prefix)
        lref[:, :] = lo_w
        href[:, :] = hi_w


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def hash160_x2_tiles(x_lm: jnp.ndarray, interpret: bool = False,
                     block_rows: int = SUBLANES):
    """x_lm: (8, rows, 128) limb-major X tiles, rows % block_rows == 0.
    Returns (lo_even, hi_even, lo_odd, hi_odd), each (rows, 128) uint32 —
    the 64-bit truncated hash160 keys of both compressed-pubkey parities.

    block_rows trades ILP vs vreg pressure: at 8 rows each live hash
    word is ONE (8,128) vreg and the strictly-serial sha/ripemd round
    chain caps issue slots (~23% VPU, docs/PERF.md); 16 rows = 2
    independent vregs per op (dual-issue) at ~56 live vregs. Swept on
    device (scripts/exp_phash_rows.py)."""
    rows = x_lm.shape[1]
    br = block_rows
    if rows % br:
        br = SUBLANES
    in_spec = pl.BlockSpec((8, br, LANES), lambda g: (0, g, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((br, LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((rows, LANES), jnp.uint32) for _ in range(4)
    )
    return pl.pallas_call(
        _hash160x2_kernel,
        out_shape=out_shapes,
        grid=(rows // br,),
        in_specs=[in_spec],
        out_specs=(out_spec,) * 4,
        interpret=interpret,
    )(x_lm)


def hash160_x2_from_batch(x_bm: jnp.ndarray, interpret: bool = False):
    """(B, 8) batch-major X -> ((lo_e, hi_e), (lo_o, hi_o)) flat (B,) words.

    Pads B to a whole (8, 128) tile; drop-in for the trunc64 part of
    hash160_from_x_both_parities.
    """
    b = x_bm.shape[0]
    tile = SUBLANES * LANES
    pad = (-b) % tile
    if pad:
        x_bm = jnp.concatenate(
            [x_bm, jnp.zeros((pad, 8), dtype=jnp.uint32)], axis=0
        )
    rows = x_bm.shape[0] // LANES
    lm = jnp.transpose(x_bm, (1, 0)).reshape(8, rows, LANES)
    le, he, lo, ho = hash160_x2_tiles(lm, interpret=interpret)
    flat = lambda a: a.reshape(-1)[:b]
    return (flat(le), flat(he)), (flat(lo), flat(ho))


# ---------------------------------------------------------------------------
# Keccak-256 of X||Y (ETH addresses) — unrolled kernel over (hi, lo) pairs
# ---------------------------------------------------------------------------

from .keccak import _RC, _ROT  # round constants / rotation offsets


def _k_rol64(hi, lo, n: int):
    n %= 64
    if n == 0:
        return hi, lo
    if n == 32:
        return lo, hi
    if n < 32:
        return ((hi << n) | (lo >> (32 - n)), (lo << n) | (hi >> (32 - n)))
    m = n - 32
    return ((lo << m) | (hi >> (32 - m)), (hi << m) | (lo >> (32 - m)))


def _keccak_round_tiles(state, rc_hi, rc_lo):
    """One keccak-f round over a 5x5 list of (hi, lo) tile pairs.
    rc_hi/rc_lo may be python uint32s (unrolled path) or traced scalars
    (fori_loop path)."""
    c = []
    for x in range(5):
        h = state[x][0][0] ^ state[x][1][0] ^ state[x][2][0] ^ state[x][3][0] ^ state[x][4][0]
        l = state[x][0][1] ^ state[x][1][1] ^ state[x][2][1] ^ state[x][3][1] ^ state[x][4][1]
        c.append((h, l))
    d = []
    for x in range(5):
        rh, rl = _k_rol64(c[(x + 1) % 5][0], c[(x + 1) % 5][1], 1)
        d.append((c[(x - 1) % 5][0] ^ rh, c[(x - 1) % 5][1] ^ rl))
    a = [
        [(state[x][y][0] ^ d[x][0], state[x][y][1] ^ d[x][1]) for y in range(5)]
        for x in range(5)
    ]
    b = [[None] * 5 for _ in range(5)]
    for x in range(5):
        for y in range(5):
            b[y][(2 * x + 3 * y) % 5] = _k_rol64(a[x][y][0], a[x][y][1], _ROT[x][y])
    out = [[None] * 5 for _ in range(5)]
    for x in range(5):
        for y in range(5):
            nh = b[x][y][0] ^ (~b[(x + 1) % 5][y][0] & b[(x + 2) % 5][y][0])
            nl = b[x][y][1] ^ (~b[(x + 1) % 5][y][1] & b[(x + 2) % 5][y][1])
            out[x][y] = (nh, nl)
    out[0][0] = (out[0][0][0] ^ rc_hi, out[0][0][1] ^ rc_lo)
    return out


def _keccak_f_unrolled(state):
    """state: 5x5 list of (hi, lo) tile pairs; 24 unrolled rounds."""
    for rc in _RC:
        state = _keccak_round_tiles(
            state, np.uint32(rc >> 32), np.uint32(rc & 0xFFFFFFFF)
        )
    return state


def _keccak_f_loop(state):
    """fori_loop variant (KEYHUNT_KECCAK_LOOP=1): carry = 50 flat tiles,
    round constants dynamically sliced per iteration. Spill-pressure
    experiment — the unrolled body keeps ~50 live (hi,lo) tiles across
    24 rounds (PERF.md: keccak at 34% VPU, vreg-spill-bound); a loop
    body gives Mosaic one round's liveness to schedule instead."""
    import jax

    def rc_at(i):
        # scalar select chain: a pallas kernel may not capture constant
        # ARRAYS (only scalars), so the (24, 2) RC table becomes 24
        # masked ORs of literal uint32s — ~48 scalar ops/round, noise
        # next to the ~3k vector ops of the round body.
        h = jnp.uint32(0)
        l = jnp.uint32(0)
        for j, r in enumerate(_RC):
            m = jnp.where(i == j, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
            h = h | (m & np.uint32(r >> 32))
            l = l | (m & np.uint32(r & 0xFFFFFFFF))
        return h, l

    flat = [state[x][y][h] for x in range(5) for y in range(5)
            for h in range(2)]

    def body(i, flat):
        st = [[(flat[(x * 5 + y) * 2], flat[(x * 5 + y) * 2 + 1])
               for y in range(5)] for x in range(5)]
        rc_hi, rc_lo = rc_at(i)
        st = _keccak_round_tiles(st, rc_hi, rc_lo)
        return [st[x][y][h] for x in range(5) for y in range(5)
                for h in range(2)]

    flat = jax.lax.fori_loop(0, len(_RC), body, flat)
    return [[(flat[(x * 5 + y) * 2], flat[(x * 5 + y) * 2 + 1])
             for y in range(5)] for x in range(5)]


def _keccak_f_tiles(state):
    if os.environ.get("KEYHUNT_KECCAK_LOOP"):
        return _keccak_f_loop(state)
    return _keccak_f_unrolled(state)


def keccak_eth_words(xl: List[jnp.ndarray], yl: List[jnp.ndarray]):
    """(lo, hi) 64-bit-truncated ETH address key of keccak256(X_be||Y_be)
    (digest bytes 12..19 as two LE words — the target packing). Pure tile
    function — usable from any kernel."""
    zero = jnp.zeros_like(xl[0])
    state = [[(zero, zero)] * 5 for _ in range(5)]

    def set_lane(idx, lane):
        state[idx % 5][idx // 5] = lane

    for k in range(4):
        set_lane(k, (_bswap(xl[6 - 2 * k]), _bswap(xl[7 - 2 * k])))
    for k in range(4):
        set_lane(4 + k, (_bswap(yl[6 - 2 * k]), _bswap(yl[7 - 2 * k])))
    set_lane(8, (zero, zero + 1))
    set_lane(16, (zero + np.uint32(0x80000000), zero))
    state = _keccak_f_tiles(state)
    l1 = state[1 % 5][0]
    l2 = state[2 % 5][0]
    return l1[0], l2[1]  # digest bytes 12..15 / 16..19 LE


def _keccak_pubkey_kernel(x_ref, y_ref, lo_ref, hi_ref):
    """ETH: keccak256(X_be || Y_be), output the 64-bit truncated address
    key (digest bytes 12..19 as two LE words — the target packing)."""
    xl = [x_ref[i] for i in range(8)]
    yl = [y_ref[i] for i in range(8)]
    lo_w, hi_w = keccak_eth_words(xl, yl)
    lo_ref[:, :] = lo_w
    hi_ref[:, :] = hi_w


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def keccak_eth_tiles(x_lm, y_lm, interpret: bool = False,
                     block_rows: int = SUBLANES):
    """(8, rows, 128) X/Y limb-major -> (lo, hi) ETH target keys."""
    rows = x_lm.shape[1]
    br = block_rows
    if rows % br:
        br = SUBLANES
    in_spec = pl.BlockSpec((8, br, LANES), lambda g: (0, g, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((br, LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _keccak_pubkey_kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32) for _ in range(2)
        ),
        grid=(rows // br,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec,) * 2,
        interpret=interpret,
    )(x_lm, y_lm)


def keccak_eth_from_batch(x_bm, y_bm):
    """(B, 8) x2 batch-major -> (lo, hi) flat (B,) ETH target keys."""
    b = x_bm.shape[0]
    tile = SUBLANES * LANES
    pad = (-b) % tile
    if pad:
        z = jnp.zeros((pad, 8), dtype=jnp.uint32)
        x_bm = jnp.concatenate([x_bm, z], axis=0)
        y_bm = jnp.concatenate([y_bm, z], axis=0)
    rows = x_bm.shape[0] // LANES
    xl = jnp.transpose(x_bm, (1, 0)).reshape(8, rows, LANES)
    yl = jnp.transpose(y_bm, (1, 0)).reshape(8, rows, LANES)
    lo, hi = keccak_eth_tiles(xl, yl)
    return lo.reshape(-1)[:b], hi.reshape(-1)[:b]


# ---------------------------------------------------------------------------
# Uncompressed hash160 (04 || X || Y): two-block sha256 + ripemd160
# ---------------------------------------------------------------------------


def _sha256_compress_chain(state, w):
    """One compression continuing from `state` (8 tile words)."""
    a, b, c, d, e, f, g, h = state
    wbuf = list(w)
    for i in range(64):
        if i < 16:
            wi = wbuf[i]
        else:
            w15 = wbuf[i - 15]
            w2 = wbuf[i - 2]
            sig0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
            sig1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
            wi = wbuf[i - 16] + sig0 + wbuf[i - 7] + sig1
            wbuf.append(wi)
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + np.uint32(_K[i]) + wi
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    return [x + y for x, y in zip([a, b, c, d, e, f, g, h], state)]


def hash160_u_words(xl: List[jnp.ndarray], yl: List[jnp.ndarray]):
    """(lo, hi) 64-bit-truncated hash160(04 || X_be || Y_be) target words:
    65-byte message, two sha256 blocks (same splicing as
    hash/sha256.py sha256_65_from_xy). Pure tile function."""
    zero = jnp.zeros_like(xl[0])
    w = [(zero + (4 << 24)) | (xl[7] >> 8)]
    for k in range(1, 8):
        w.append(((xl[8 - k] & MASK8) << 24) | (xl[7 - k] >> 8))
    w.append(((xl[0] & MASK8) << 24) | (yl[7] >> 8))
    for k in range(1, 7):
        w.append(((yl[8 - k] & MASK8) << 24) | (yl[7 - k] >> 8))
    w.append(((yl[1] & MASK8) << 24) | (yl[0] >> 8))
    state = [jnp.full_like(xl[0], np.uint32(hv)) for hv in _H0]
    state = _sha256_compress_chain(state, w)
    w2 = [((yl[0] & MASK8) << 24) | np.uint32(0x80 << 16)]
    w2 += [zero] * 14
    w2.append(zero + 65 * 8)
    digest = _ripemd160_32_unrolled(_sha256_compress_chain(state, w2))
    return digest[0], digest[1]


def _hash160_u_kernel(x_ref, y_ref, lo_ref, hi_ref):
    xl = [x_ref[i] for i in range(8)]
    yl = [y_ref[i] for i in range(8)]
    lo_w, hi_w = hash160_u_words(xl, yl)
    lo_ref[:, :] = lo_w
    hi_ref[:, :] = hi_w


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def hash160_u_tiles(x_lm, y_lm, interpret: bool = False,
                    block_rows: int = SUBLANES):
    rows = x_lm.shape[1]
    br = block_rows
    if rows % br:
        br = SUBLANES
    in_spec = pl.BlockSpec((8, br, LANES), lambda g: (0, g, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((br, LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _hash160_u_kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32) for _ in range(2)
        ),
        grid=(rows // br,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec,) * 2,
        interpret=interpret,
    )(x_lm, y_lm)


def hash160_u_from_batch(x_bm, y_bm, interpret: bool = False):
    """(B, 8) x2 -> (lo, hi) flat (B,) uncompressed-hash160 target keys."""
    b = x_bm.shape[0]
    tile = SUBLANES * LANES
    pad = (-b) % tile
    if pad:
        z = jnp.zeros((pad, 8), dtype=jnp.uint32)
        x_bm = jnp.concatenate([x_bm, z], axis=0)
        y_bm = jnp.concatenate([y_bm, z], axis=0)
    rows = x_bm.shape[0] // LANES
    xl = jnp.transpose(x_bm, (1, 0)).reshape(8, rows, LANES)
    yl = jnp.transpose(y_bm, (1, 0)).reshape(8, rows, LANES)
    lo, hi = hash160_u_tiles(xl, yl, interpret=interpret)
    return lo.reshape(-1)[:b], hi.reshape(-1)[:b]
