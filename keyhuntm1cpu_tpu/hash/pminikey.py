"""Pallas minikey validity kernel: base58 suffix generation + sha256.

Reference capability: minikey validity testing, the hot loop of
keyhunt -m minikeys (keyhunt.cpp:5698-5739 computes sha256(minikey+'?')
per candidate and keeps those with a 0x00 leading byte).

Round-2's minikey engine ran BOTH full-batch sha256 passes (validity and
key derivation) through the XLA lax.scan pipeline — ~150 serial HLO steps
each — which capped the mode at ~20 M minikeys/s while the fused brute
kernel's in-kernel sha256 tiles sustain >600 M hashes/s.  This kernel
moves the 256-to-1 rejection filter into Pallas:

  per (8, 128) tile lane:
    v      = base_lo + global lane index        (uint32 counter)
    digits = 5 base-58 digits of v              (magic-multiply divmod —
                                                 Mosaic has no vector
                                                 integer divide)
    chars  = range-select alphabet mapping      (6 selects for canonical
                                                 base58, <=58 worst case)
    w      = 16 broadcast message words | chars (bytes 17..21 of the
                                                 23-byte 'S...?' message)
    valid  = sha256(w)[0] >> 24 == 0

The key-derivation sha256 then runs in XLA on ONLY the ~B/256 surviving
lanes (engine/minikeys.py), so the full-batch work is one Pallas pass.

Division by 58 uses the Granlund-Montgomery magic multiply
q = mulhi32(v, M) >> 3 with (M, k) = (592409283, 35), exhaustively
verified for all v < 58**5 at every floor-plateau boundary
(tests/test_pminikey.py); products are built from 16-bit limb partials
because Mosaic has no 32x32->64 multiply.
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

from .phash import _sha256_compress_unrolled, LANES, SUBLANES

TILE = SUBLANES * LANES  # lanes per grid block

# magic divide-by-58 constants: q = (v * M) >> 35 for all v < 58**5
_DIV58_M = 592409283
_DIV58_M0 = np.uint32(_DIV58_M & 0xFFFF)
_DIV58_M1 = np.uint32(_DIV58_M >> 16)
_DIV58_S = 3  # 35 - 32: only the product's high word matters


def b58_runs(alphabet: str) -> Tuple[Tuple[int, int, int], ...]:
    """Decompose an alphabet into maximal consecutive-ASCII runs
    (start_digit, end_digit, uint32 wrap-add offset)."""
    vals = [ord(c) for c in alphabet]
    runs = []
    i = 0
    while i < 58:
        j = i
        while j + 1 < 58 and vals[j + 1] == vals[j] + 1:
            j += 1
        runs.append((i, j, (vals[i] - i) & 0xFFFFFFFF))
        i = j + 1
    return tuple(runs)


def _char_from_digit(d: jnp.ndarray, runs) -> jnp.ndarray:
    c = jnp.zeros_like(d)
    for (i, j, off) in runs:
        hit = (d <= np.uint32(j)) if i == 0 else (
            (d >= np.uint32(i)) & (d <= np.uint32(j))
        )
        c = jnp.where(hit, d + np.uint32(off), c)
    return c


def _div58(v: jnp.ndarray) -> jnp.ndarray:
    """floor(v / 58) for uint32 v < 58**5, branch- and divide-free."""
    v0 = v & np.uint32(0xFFFF)
    v1 = v >> 16
    p00 = v0 * _DIV58_M0
    p01 = v0 * _DIV58_M1
    p10 = v1 * _DIV58_M0
    p11 = v1 * _DIV58_M1
    mid = p01 + p10
    c1 = (mid < p01).astype(jnp.uint32)  # carry out of the mid sum
    lo = p00 + (mid << 16)
    c2 = (lo < p00).astype(jnp.uint32)  # carry from the low word
    hi = p11 + (mid >> 16) + (c1 << 16) + c2
    return hi >> _DIV58_S


def suffix_digits(v: jnp.ndarray, n: int) -> List[jnp.ndarray]:
    """n base-58 digits of v, most-significant first (tile-safe math)."""
    digits = []
    x = v
    for _ in range(n):
        q = _div58(x)
        digits.append(x - q * np.uint32(58))
        x = q
    digits.reverse()
    return digits


def minikey_valid_tile(v: jnp.ndarray, w23: List[jnp.ndarray],
                       runs) -> jnp.ndarray:
    """Validity mask tile: v = suffix counters (any tile shape), w23 =
    16 scalar-or-tile message-base words. Pure tile function — testable
    under plain XLA (tests/test_pminikey.py) and callable from any
    kernel; the pallas wrapper below only adds ref IO + lane indexing."""
    ch = [_char_from_digit(d, runs) for d in suffix_digits(v, 5)]
    w4or = (ch[0] << 16) | (ch[1] << 8) | ch[2]
    w5or = (ch[3] << 24) | (ch[4] << 16)
    zero = jnp.zeros_like(v)
    w = [zero + w23[i] for i in range(16)]
    w[4] = w[4] | w4or
    w[5] = w[5] | w5or
    h0 = _sha256_compress_unrolled(w)[0]
    return (h0 >> np.uint32(24) == 0).astype(jnp.uint32)


def _minikey_valid_kernel(sc_ref, out_ref, *, runs, br):
    g = pl.program_id(0)
    base = sc_ref[0]
    idx = (
        jax.lax.broadcasted_iota(jnp.uint32, (br, LANES), 0)
        * np.uint32(LANES)
        + jax.lax.broadcasted_iota(jnp.uint32, (br, LANES), 1)
    )
    v = base + g.astype(jnp.uint32) * np.uint32(br * LANES) + idx
    w23 = [sc_ref[1 + i] for i in range(16)]
    out_ref[:, :] = minikey_valid_tile(v, w23, runs)


def _minikey_valid_call(base_lo, w23_base, *, B: int,
                        alphabet: str, interpret: bool,
                        block_rows: int = SUBLANES) -> jnp.ndarray:
    """block_rows: grid-block rows (KEYHUNT_MINIKEY_VALID_BR overrides).
    At 8 rows each live sha word is ONE vreg and the serial compress
    chain bounds issue ILP; 16/32 rows give 2/4 independent vregs per
    op (the gate-35 pattern: hash160_x2 +38% at 16). Swept on device by
    gate 50 before changing any default."""
    sc = jnp.concatenate(
        [jnp.asarray(base_lo, jnp.uint32).reshape(1),
         w23_base.astype(jnp.uint32)]
    )
    rows = B // LANES
    br = block_rows if rows % block_rows == 0 else SUBLANES
    kern = functools.partial(
        _minikey_valid_kernel, runs=b58_runs(alphabet), br=br
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        grid=(rows // br,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (br, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(sc)
    return out.reshape(-1)


_minikey_valid_jit = jax.jit(
    _minikey_valid_call,
    static_argnames=("B", "alphabet", "interpret", "block_rows"),
)


def minikey_valid(base_lo, w23_base, *, B: int,
                  alphabet: str, interpret: bool = False) -> jnp.ndarray:
    """(B,) uint32 validity mask of minikeys [base_lo, base_lo + B).

    base_lo: uint32 scalar suffix counter (low 5 device digits);
    w23_base: (16,) uint32 padded-block words of the 23-byte message
    'S' + 16 prefix chars + 5 zero bytes + '?' (the 5 digit byte
    positions are OR-filled in-kernel).  B % 1024 == 0.

    interpret=True (CPU validation) runs the Mosaic TPU simulator —
    its first compile is SLOW (minutes on a small host, like every
    interpret-mode kernel in this repo) and is served from the
    persistent compile cache afterwards; tests keep to ONE (B,
    alphabet) config for that reason.
    """
    if B % TILE:
        raise ValueError(f"B must be a multiple of {TILE}, got {B}")
    # 32-row blocks measured -24% vs 8 at B=2^23 (gate 50: 7.36 ms /
    # 1139M lanes/s vs 9.62 ms, equality-gated); untileable B falls
    # back to 8 rows inside _minikey_valid_call
    br = int(os.environ.get("KEYHUNT_MINIKEY_VALID_BR", 32))
    return _minikey_valid_jit(
        base_lo, w23_base, B=B, alphabet=alphabet, interpret=interpret,
        block_rows=br,
    )
