"""Fused hash160 pipelines (sha256 -> ripemd160) from point limbs.

``hash160_from_x_both_parities`` is the workhorse of the brute-force
engines: from X-only walk output it produces the hash160 of BOTH the
even (02) and odd (03) compressed pubkeys without ever computing Y — the
reference's GetHash160_fromX strategy (SECP256K1.cpp:746-790, used at
keyhunt.cpp:2721-2728). The engine checks both against the target set and
the host reconstructs the parity during exact verification.

Digest packing: 5 uint32 words per hash160, word i = digest bytes
[4i, 4i+4) read little-endian (matching filter/targets host packing).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from .ripemd160 import ripemd160_32
from .sha256 import sha256_33_from_x, sha256_65_from_xy


def hash160_from_x_both_parities(
    x_limbs: jnp.ndarray,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """(even_words, odd_words): each 5 x (B,) uint32 hash160 words."""
    even_prefix = jnp.full(x_limbs.shape[:-1], 2, dtype=jnp.uint32)
    odd_prefix = jnp.full(x_limbs.shape[:-1], 3, dtype=jnp.uint32)
    even = ripemd160_32(sha256_33_from_x(x_limbs, even_prefix))
    odd = ripemd160_32(sha256_33_from_x(x_limbs, odd_prefix))
    return even, odd


def hash160_from_x_parity(x_limbs: jnp.ndarray, odd: jnp.ndarray) -> List[jnp.ndarray]:
    """hash160 of the compressed pubkey with a known parity bit (B,)."""
    prefix = jnp.uint32(2) + odd.astype(jnp.uint32)
    return ripemd160_32(sha256_33_from_x(x_limbs, prefix))


def hash160_from_xy(x_limbs: jnp.ndarray, y_limbs: jnp.ndarray) -> List[jnp.ndarray]:
    """hash160 of the uncompressed (04 || X || Y) pubkey."""
    return ripemd160_32(sha256_65_from_xy(x_limbs, y_limbs))
