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


def _f(j: int, x, y, z):
    if j < 16:
        return x ^ y ^ z
    if j < 32:
        return (x & y) | (~x & z)
    if j < 48:
        return (x | ~y) ^ z
    if j < 64:
        return (x & z) | (y & ~z)
    return x ^ (y | ~z)


def ripemd160_32(sha_words_be: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """RIPEMD-160 of a 32-byte message given as 8 big-endian uint32 words.

    Returns the 5 state words (standard serialization is each word
    little-endian: byte k of the digest = word[k//4] >> 8*(k%4)).
    """
    zero = jnp.zeros_like(sha_words_be[0])
    # message words are little-endian: byte-swap the BE sha digest words
    x = [_bswap32(wd) for wd in sha_words_be]
    x.append(jnp.full_like(zero, 0x80))  # padding byte (LE word)
    x += [zero] * 5
    x.append(jnp.full_like(zero, 256))  # bit length, low word
    x.append(zero)

    a1, b1, c1, d1, e1 = (jnp.full_like(zero, v) for v in _IV)
    a2, b2, c2, d2, e2 = (jnp.full_like(zero, v) for v in _IV)
    for j in range(80):
        t = _rol(a1 + _f(j, b1, c1, d1) + x[_R1[j]] + _U32(_K1[j // 16]), _S1[j]) + e1
        a1, e1, d1, c1, b1 = e1, d1, _rol(c1, 10), b1, t
        t = _rol(a2 + _f(79 - j, b2, c2, d2) + x[_R2[j]] + _U32(_K2[j // 16]), _S2[j]) + e2
        a2, e2, d2, c2, b2 = e2, d2, _rol(c2, 10), b2, t
    h0, h1, h2, h3, h4 = (_U32(v) for v in _IV)
    return [
        h1 + c1 + d2,
        h2 + d1 + e2,
        h3 + e1 + a2,
        h4 + a1 + b2,
        h0 + b1 + c2,
    ]
