"""Pallas scalar-mult ladder: k*G for arbitrary 256-bit scalars.

Why: the minikey engine is LADDER-bound after the round-5 dense
compaction (docs/PERF.md minikeys ledger: fin:ladder 82.7 ms of the
85.9 ms finish at V=34816) — minikey private keys are SHA-256 outputs,
so unlike every walk mode there is no incremental structure and each
valid lane pays a full windowed scalar mult. The XLA ladder
(points.scalar_mult_batch_jac) runs its ~12 field muls per window at
~150M modmul-lanes/s — 24x below the measured Pallas field throughput
(pwalk kernel B, docs/PERF.md ledger) because every (B, 8) intermediate
round-trips HBM.

Split of labor:

- **XLA: the table gather as an exact int8 MXU matmul.** qx = gx[byte]
  is a (B,)-indexed gather into the (256, 8) window table. Instead of
  per-element gathers, one-hot(byte) int8 (B, 256) @ table-bytes
  (256, 32) int8 -> int32 is EXACT (every u32 limb split into 4 bytes,
  centered at -128 so 0..255 fits int8; one-hot rows sum to 1 so the
  +128 offset restores additively) and runs on the MXU — the only
  matmul in this whole integer framework.
- **Pallas: 32 Jacobian mixed adds on limb-major tiles** (fe_tiles),
  one fori_loop (an unrolled 384-mul body blows Mosaic compile), then
  ONE grouped Montgomery inversion per grid block normalizes to affine.

Same contract as scalar_mult_batch_jac: `irregular` lanes hit a
doubling/cancellation edge mid-ladder and must be host re-verified
(probability ~2^-250 per random scalar).

Reference capability: Secp256K1::ComputePublicKey — 32 byte-window
table adds (/root/reference/secp256k1/SECP256K1.cpp:61-82).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fe_tiles as ft
from .points import PointBatch

LANES = 128


# ---------------------------------------------------------------------------
# XLA side: exact one-hot MXU gather of per-window table points
# ---------------------------------------------------------------------------


def _table_bytes_centered(gt: jnp.ndarray) -> jnp.ndarray:
    """(32, 256, 8) uint32 -> (32, 256, 32) int8, each limb as 4 LE
    bytes centered at -128 (so the int8 dot is exact)."""
    b = jnp.stack(
        [(gt >> jnp.uint32(8 * i)) & jnp.uint32(0xFF) for i in range(4)],
        axis=-1,
    )  # (32, 256, 8, 4) uint32, byte i of limb j at [..., j, i]
    b = b.reshape(gt.shape[0], gt.shape[1], 32)
    return (b.astype(jnp.int32) - 128).astype(jnp.int8)


def _gather_windows(k: jnp.ndarray, gtx: jnp.ndarray, gty: jnp.ndarray):
    """(B, 8) scalars -> per-window affine points via the MXU.

    Returns (qx, qy) (32, B, 8) uint32 and q_inf (32, B) bool."""
    bytes_w = jnp.stack(
        [
            (k[..., w // 4] >> jnp.uint32(8 * (w % 4))) & jnp.uint32(0xFF)
            for w in range(32)
        ]
    )  # (32, B)
    tbx = _table_bytes_centered(gtx)
    tby = _table_bytes_centered(gty)
    iota = jnp.arange(256, dtype=jnp.uint32)

    def one_window(_, xs):
        byte, tx, ty = xs
        onehot = (byte[:, None] == iota[None, :]).astype(jnp.int8)
        dn = (((1,), (0,)), ((), ()))

        def gat(tb):
            r = jax.lax.dot_general(
                onehot, tb, dn, preferred_element_type=jnp.int32
            ) + 128  # (B, 32) exact bytes
            r = r.astype(jnp.uint32).reshape(byte.shape[0], 8, 4)
            return (
                r[..., 0]
                | (r[..., 1] << jnp.uint32(8))
                | (r[..., 2] << jnp.uint32(16))
                | (r[..., 3] << jnp.uint32(24))
            )

        return None, (gat(tx), gat(ty))

    # scan over windows bounds the one-hot to (B, 256) int8 at a time
    _, (qx, qy) = jax.lax.scan(one_window, None, (bytes_w, tbx, tby))
    return qx, qy, bytes_w == 0


# ---------------------------------------------------------------------------
# Pallas kernel: 32 mixed adds + grouped inversion, limb-major tiles
# ---------------------------------------------------------------------------


def _madd_flag(X, Y, Z, qx, qy):
    """Jacobian P + affine Q (madd-2007-bl, ~12M). No doubling fallback:
    h == 0 lanes are FLAGGED (same contract as the XLA ladder — the
    caller host-verifies them exactly), saving the dbl path's ~8 muls
    that pwalk._mixed_add pays."""
    z2 = ft.sqr(Z)
    u2 = ft.mul(qx, z2)
    s2 = ft.mul(qy, ft.mul(Z, z2))
    h = ft.sub(u2, X)
    r = ft.sub(s2, Y)
    h_zero = ft.is_zero(h)
    h = ft.select(h_zero, ft.one_like(h), h)
    hh = ft.sqr(h)
    v = ft.mul(X, hh)
    hhh = ft.mul(h, hh)
    x3 = ft.sub(ft.sub(ft.sqr(r), hhh), ft.dbl(v))
    y3 = ft.sub(ft.mul(r, ft.sub(v, x3)), ft.mul(Y, hhh))
    z3 = ft.mul(Z, h)
    return x3, y3, z3, h_zero


def _ladder_blocks(load_window, tile, *, n_groups: int):
    """Tile math shared by the kernel and the CPU tests.

    load_window(w) -> (qx (8, BR, 128) u32, qy, q_inf (BR, 128) u32) for
    window w — a ref pl.ds load in the kernel, an array dynamic slice in
    the plain-XLA test path (jitting interpret-mode pallas pays >20 min
    of per-op interpreter overhead for the ~650 tile muls, so the tests
    run this function directly). tile = (BR, 128). Returns ax/ay
    (8, BR, 128), flags (2, BR, 128) u32 (inf, irregular)."""

    def body(w, carry):
        # masks cross the loop boundary as uint32 0/1 tiles: carrying
        # i1 vectors through the scf loop trips a Mosaic vmask-layout
        # bug (arith.andi on vector<8x128x32xi1> x vector<8x128xi1>,
        # internal compile error — gate 45 first attempt)
        X, Y, Z, inf_u, irr_u = carry
        inf = inf_u != 0
        qxw, qyw, qiw = load_window(w)
        q_inf = qiw != 0
        x3, y3, z3, hz = _madd_flag(X, Y, Z, qxw, qyw)
        irr_u = irr_u | (hz & ~inf & ~q_inf).astype(jnp.uint32)
        one = ft.one_like(X)
        X = ft.select(q_inf, X, ft.select(inf, qxw, x3))
        Y = ft.select(q_inf, Y, ft.select(inf, qyw, y3))
        Z = ft.select(q_inf, Z, ft.select(inf, one, z3))
        return X, Y, Z, (inf & q_inf).astype(jnp.uint32), irr_u

    zero = jnp.zeros((8,) + tile, dtype=jnp.uint32)
    inf0 = jnp.ones(tile, dtype=jnp.uint32)  # accumulator starts at inf
    irr0 = jnp.zeros(tile, dtype=jnp.uint32)
    X, Y, Z, inf_u, irr_u = jax.lax.fori_loop(
        0, 32, body, (zero, zero, ft.one_like(zero), inf0, irr0)
    )
    # normalize: zero/flagged Z -> 1 keeps the inversion chain exact
    z_safe = ft.select(ft.is_zero(Z) | (inf_u != 0), ft.one_like(Z), Z)
    zi = ft.montgomery_inv_groups(z_safe, n_groups=n_groups)
    zi2 = ft.sqr(zi)
    ax = ft.mul(X, zi2)
    ay = ft.mul(Y, ft.mul(zi, zi2))
    flags = jnp.stack([inf_u, irr_u])
    return ax, ay, flags


def _ladder_blocks_arrays(qx, qy, qinf, *, n_groups: int):
    """Plain-XLA entry for tests: window slices via dynamic_slice."""

    def load(w):
        return (
            jax.lax.dynamic_index_in_dim(qx, w, keepdims=False),
            jax.lax.dynamic_index_in_dim(qy, w, keepdims=False),
            jax.lax.dynamic_index_in_dim(qinf, w, keepdims=False),
        )

    return _ladder_blocks(load, qinf.shape[1:], n_groups=n_groups)


def _ladder_kernel(qx_ref, qy_ref, qinf_ref, ax_ref, ay_ref, flags_ref,
                   *, n_groups: int, br: int):
    """3D refs, windows flattened into the sublane dim (window-major):
    qx/qy (8, 32*BR, 128), qinf (32*BR, 128) — 4D blocks with a leading
    32 gave Mosaic pathological layouts (gate 45: vmask crash; 45b
    first attempt: >30 min compile)."""

    def load(w):
        return (
            qx_ref[:, pl.ds(w * br, br), :],
            qy_ref[:, pl.ds(w * br, br), :],
            qinf_ref[pl.ds(w * br, br), :],
        )

    ax, ay, flags = _ladder_blocks(load, (br, LANES), n_groups=n_groups)
    ax_ref[...] = ax
    ay_ref[...] = ay
    flags_ref[...] = flags


def scalar_mult_tiles(
    k: jnp.ndarray,
    gtable_x: jnp.ndarray,
    gtable_y: jnp.ndarray,
    block_rows: int = 8,
    interpret: bool = False,
) -> Tuple[PointBatch, jnp.ndarray]:
    """Batched k*G, Pallas ladder. Drop-in for scalar_mult_batch_jac
    (same (points, irregular) contract); B is padded to block_rows*128.

    interpret=True runs EAGERLY (CPU tests): jitting the interpret-mode
    kernel graph takes >25 min of XLA:CPU compile; eager dispatch of the
    same tile ops takes ~a minute at B=128."""
    if interpret:
        return _scalar_mult_tiles(k, gtable_x, gtable_y, block_rows, True)
    return _scalar_mult_tiles_jit(k, gtable_x, gtable_y, block_rows, False)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _scalar_mult_tiles_jit(k, gtable_x, gtable_y, block_rows, interpret):
    return _scalar_mult_tiles(k, gtable_x, gtable_y, block_rows, interpret)


def _scalar_mult_tiles(
    k: jnp.ndarray,
    gtable_x: jnp.ndarray,
    gtable_y: jnp.ndarray,
    block_rows: int = 8,
    interpret: bool = False,
) -> Tuple[PointBatch, jnp.ndarray]:
    bsz = k.shape[0]
    tile = block_rows * LANES
    pad = (-bsz) % tile
    if pad:
        k = jnp.concatenate(
            [k, jnp.ones((pad, 8), dtype=jnp.uint32)], axis=0
        )
    n = k.shape[0]
    rows = n // LANES
    qx, qy, q_inf = _gather_windows(k, gtable_x, gtable_y)
    # window-major sublane layout: each grid block r owns a contiguous
    # (32 * block_rows)-row slab holding ITS rows for every window —
    # 3D refs only (4D blocks with a leading 32 gave Mosaic
    # pathological layouts; see _ladder_kernel docstring)
    nb = rows // block_rows
    br = block_rows

    def slab(a, limb_first):
        # (32, n[, 8]) -> (8, nb*32*br, 128) / (nb*32*br, 128)
        if limb_first:
            v = a.reshape(32, nb, br, LANES, 8)
            v = jnp.transpose(v, (4, 1, 0, 2, 3))
            return v.reshape(8, nb * 32 * br, LANES)
        v = a.reshape(32, nb, br, LANES)
        return jnp.transpose(v, (1, 0, 2, 3)).reshape(nb * 32 * br, LANES)

    qx_lm = slab(qx, True)
    qy_lm = slab(qy, True)
    qi_lm = slab(q_inf.astype(jnp.uint32), False)

    bspec = lambda shp, idx: pl.BlockSpec(shp, idx)
    ax, ay, flags = pl.pallas_call(
        functools.partial(
            _ladder_kernel, n_groups=max(1, block_rows // 8), br=br
        ),
        grid=(nb,),
        in_specs=[
            bspec((8, 32 * br, LANES), lambda r: (0, r, 0)),
            bspec((8, 32 * br, LANES), lambda r: (0, r, 0)),
            bspec((32 * br, LANES), lambda r: (r, 0)),
        ],
        out_specs=[
            bspec((8, br, LANES), lambda r: (0, r, 0)),
            bspec((8, br, LANES), lambda r: (0, r, 0)),
            bspec((2, br, LANES), lambda r: (0, r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((8, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2, rows, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(qx_lm, qy_lm, qi_lm)
    x_bm = ft.from_tiles(ax)[:bsz]
    y_bm = ft.from_tiles(ay)[:bsz]
    inf = flags[0].reshape(-1)[:bsz] != 0
    irr = flags[1].reshape(-1)[:bsz] != 0
    return PointBatch(x_bm, y_bm, inf), irr
