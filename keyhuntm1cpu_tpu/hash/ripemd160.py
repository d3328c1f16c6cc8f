"""Vectorized single-block RIPEMD-160 of a 32-byte SHA-256 digest.

The only message size the address pipeline ever hashes is the fixed
32-byte sha256 output (reference hash/ripemd160.cpp ripemd160_32 /
ripemd160sse_32), so padding is baked in. 160 rounds (two parallel lines
of 80) statically unrolled over (B,) uint32 lanes.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

_U32 = jnp.uint32

_R1 = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13,
]
_R2 = [
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11,
]
_S1 = [
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6,
]
_S2 = [
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11,
]
_K1 = [0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E]
_K2 = [0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000]

_IV = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0)


def _rol(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return (x << _U32(n)) | (x >> _U32(32 - n))


def _bswap32(x: jnp.ndarray) -> jnp.ndarray:
    return (
        ((x & _U32(0xFF)) << _U32(24))
        | ((x & _U32(0xFF00)) << _U32(8))
        | ((x >> _U32(8)) & _U32(0xFF00))
        | (x >> _U32(24))
    )


def _f_group(g: jnp.ndarray, x, y, z):
    """RIPEMD round function selected by traced group index g = j // 16."""
    f0 = x ^ y ^ z
    f1 = (x & y) | (~x & z)
    f2 = (x | ~y) ^ z
    f3 = (x & z) | (y & ~z)
    f4 = x ^ (y | ~z)
    return jnp.select([g == 0, g == 1, g == 2, g == 3], [f0, f1, f2, f3], f4)


def _rol_t(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Rotate-left by a traced (scalar) amount."""
    return (x << n) | (x >> (_U32(32) - n))


def ripemd160_32(sha_words_be: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """RIPEMD-160 of a 32-byte message given as 8 big-endian uint32 words.

    lax.scan over the 80 dual-line rounds (round body traced once;
    per-round message word selection is a tiny axis-0 gather). Returns the
    5 state words (serialization: byte k of digest = word[k//4] >> 8*(k%4)).
    """
    import jax
    import numpy as np

    zero = jnp.zeros_like(sha_words_be[0])
    # message words are little-endian: byte-swap the BE sha digest words
    x = [_bswap32(wd) for wd in sha_words_be]
    x.append(jnp.full_like(zero, 0x80))  # padding byte (LE word)
    x += [zero] * 5
    x.append(jnp.full_like(zero, 256))  # bit length, low word
    x.append(zero)
    xs_msg = jnp.stack(x)  # (16, ...batch)

    u32a = lambda v: np.asarray(v, dtype=np.uint32)  # noqa: E731
    rounds = (
        jnp.asarray(u32a(_R1)),
        jnp.asarray(u32a(_R2)),
        jnp.asarray(u32a(_S1)),
        jnp.asarray(u32a(_S2)),
        jnp.asarray(u32a([_K1[j // 16] for j in range(80)])),
        jnp.asarray(u32a([_K2[j // 16] for j in range(80)])),
        jnp.asarray(u32a([j // 16 for j in range(80)])),
    )

    init1 = tuple(jnp.full_like(zero, v) for v in _IV)
    init2 = tuple(jnp.full_like(zero, v) for v in _IV)

    def body(carry, xs):
        a1, b1, c1, d1, e1, a2, b2, c2, d2, e2 = carry
        r1, r2, s1, s2, k1, k2, grp = xs
        t = _rol_t(a1 + _f_group(grp, b1, c1, d1) + xs_msg[r1] + k1, s1) + e1
        a1, e1, d1, c1, b1 = e1, d1, _rol(c1, 10), b1, t
        t = _rol_t(a2 + _f_group(4 - grp, b2, c2, d2) + xs_msg[r2] + k2, s2) + e2
        a2, e2, d2, c2, b2 = e2, d2, _rol(c2, 10), b2, t
        return (a1, b1, c1, d1, e1, a2, b2, c2, d2, e2), None

    carry, _ = jax.lax.scan(body, (*init1, *init2), rounds)
    a1, b1, c1, d1, e1, a2, b2, c2, d2, e2 = carry
    h0, h1, h2, h3, h4 = (_U32(v) for v in _IV)
    return [
        h1 + c1 + d2,
        h2 + d1 + e2,
        h3 + e1 + a2,
        h4 + a1 + b2,
        h0 + b1 + c2,
    ]
