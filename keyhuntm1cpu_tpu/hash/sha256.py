"""Vectorized SHA-256 specialized for 33- and 65-byte pubkey messages.

Messages are packed straight from uint32 X/Y limb arrays into big-endian
schedule words — no byte buffers ever materialize (the limb-splicing idea
of reference SECP256K1.cpp:513-580 KEYBUFFCOMP/UNCOMP, re-done as lane
arithmetic). Compression is the plain FIPS 180-4 round function, 64 rounds
statically unrolled over (B,)-shaped uint32 lanes.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

_U32 = jnp.uint32

_H0 = (0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
       0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)

_K = (
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
)


def _rotr(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return (x >> _U32(n)) | (x << _U32(32 - n))


def _compress_chained(state: Sequence[jnp.ndarray], w16: List[jnp.ndarray]):
    """One SHA-256 compression over (B,)-lane words (Davies-Meyer chained).

    lax.scan over the 64 rounds with a rotating 16-word schedule buffer:
    the round body is traced once (~40 ops) instead of unrolled (~3.5k
    ops), which collapses XLA compile time; runtime is unchanged since the
    rounds are serial anyway.
    """
    import jax
    import numpy as np

    init = list(state)
    w = jnp.stack(w16)  # (16, ...batch)
    ks = jnp.asarray(np.asarray(_K, dtype=np.uint32))  # (64,)

    def body(carry, k_const):
        a, b, c, d, e, f, g, h = carry[:8]
        wbuf = carry[8]
        wi = wbuf[0]
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + k_const + wi
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        # extend: w[i+16] = w[i] + sig0(w[i+1]) + w[i+9] + sig1(w[i+14])
        sig0 = _rotr(wbuf[1], 7) ^ _rotr(wbuf[1], 18) ^ (wbuf[1] >> _U32(3))
        sig1 = _rotr(wbuf[14], 17) ^ _rotr(wbuf[14], 19) ^ (wbuf[14] >> _U32(10))
        wnew = wbuf[0] + sig0 + wbuf[9] + sig1
        wbuf = jnp.concatenate([wbuf[1:], wnew[None]], axis=0)
        return (t1 + t2, a, b, c, d + t1, e, f, g, wbuf), None

    carry0 = (*state, w)
    out, _ = jax.lax.scan(body, carry0, ks)
    return [x + y for x, y in zip(out[:8], init)]


def sha256_block_words(w16: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """SHA-256 of one pre-padded 64-byte block given as 16 BE words (B,).

    Used by the minikeys engine (22/23-byte messages packed host-side —
    reference sha256sse_22/23, keyhunt.cpp:5698-5739 capability)."""
    state = [jnp.full_like(w16[0], h) for h in _H0]
    return _compress_chained(state, list(w16))


def sha256_33_from_x(x_limbs: jnp.ndarray, prefix: jnp.ndarray) -> List[jnp.ndarray]:
    """SHA-256 of the 33-byte compressed pubkey [prefix || X_be].

    x_limbs: (B, 8) uint32 LE limbs. prefix: (B,) uint32 (2 or 3).
    Returns 8 big-endian digest words, each (B,).
    """
    xl = [x_limbs[..., i] for i in range(8)]
    zero = jnp.zeros_like(xl[0])
    w = [prefix << _U32(24) | (xl[7] >> _U32(8))]
    for k in range(1, 8):
        w.append((xl[8 - k] & _U32(0xFF)) << _U32(24) | (xl[7 - k] >> _U32(8)))
    w.append((xl[0] & _U32(0xFF)) << _U32(24) | _U32(0x80 << 16))
    w += [zero] * 6
    w.append(jnp.full_like(xl[0], 33 * 8))
    state = [jnp.full_like(xl[0], h) for h in _H0]
    return _compress_chained(state, w)


def sha256_65_from_xy(x_limbs: jnp.ndarray, y_limbs: jnp.ndarray) -> List[jnp.ndarray]:
    """SHA-256 of the 65-byte uncompressed pubkey [04 || X_be || Y_be]."""
    xl = [x_limbs[..., i] for i in range(8)]
    yl = [y_limbs[..., i] for i in range(8)]
    zero = jnp.zeros_like(xl[0])
    # block 1: bytes 0..63
    w = [_U32(4 << 24) | (xl[7] >> _U32(8))]
    for k in range(1, 8):
        w.append((xl[8 - k] & _U32(0xFF)) << _U32(24) | (xl[7 - k] >> _U32(8)))
    w.append((xl[0] & _U32(0xFF)) << _U32(24) | (yl[7] >> _U32(8)))
    for k in range(1, 7):
        w.append((yl[8 - k] & _U32(0xFF)) << _U32(24) | (yl[7 - k] >> _U32(8)))
    w.append((yl[1] & _U32(0xFF)) << _U32(24) | (yl[0] >> _U32(8)))
    state = [jnp.full_like(xl[0], h) for h in _H0]
    state = _compress_chained(state, w)
    # block 2: byte 64 = Y_be byte 31, then 0x80 padding, length 520
    w2 = [(yl[0] & _U32(0xFF)) << _U32(24) | _U32(0x80 << 16)]
    w2 += [zero] * 14
    w2.append(jnp.full_like(xl[0], 65 * 8))
    return _compress_chained(state, w2)
