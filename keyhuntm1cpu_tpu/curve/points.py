"""Batched affine secp256k1 point arithmetic.

A point batch is a :class:`PointBatch` of ``x``/``y`` uint32 limb arrays of
shape ``(..., 8)`` plus an ``inf`` bool mask ``(...,)``. All operations are
branch-free: every lane computes both the chord and tangent formulas'
ingredients and selects by mask, so the whole batch stays on the VPU with
one *batched* modular inversion per operation (never one per element —
the reference pays one ModInv per AddDirect, SECP256K1.cpp:242-266; we
amortize via field.batch_inv_mod_p).

Scalar multiplication uses the reference's windowed-generator-table idea
(GTable, reference secp256k1/SECP256K1.cpp:29-82) re-expressed as 32
masked batched adds over gathered table entries.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fe
from ..ref import ecref


class PointBatch(NamedTuple):
    x: jnp.ndarray  # (..., 8) uint32
    y: jnp.ndarray  # (..., 8) uint32
    inf: jnp.ndarray  # (...,) bool

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


def infinity(batch_shape: Tuple[int, ...] = ()) -> PointBatch:
    z = jnp.zeros(batch_shape + (fe.LIMBS,), dtype=jnp.uint32)
    return PointBatch(z, z, jnp.ones(batch_shape, dtype=bool))


def point_batch_from_ints(pts: Sequence[Optional[Tuple[int, int]]]) -> PointBatch:
    """Host: list of affine python-int points (None = infinity) -> PointBatch."""
    xs, ys, infs = [], [], []
    for pt in pts:
        if pt is None:
            xs.append(0)
            ys.append(0)
            infs.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            infs.append(False)
    return PointBatch(
        fe.from_ints(xs), fe.from_ints(ys), jnp.asarray(np.array(infs, dtype=bool))
    )


def point_batch_to_ints(p: PointBatch):
    """Device -> host: list of (x, y) tuples or None."""
    xs = fe.to_ints(p.x)
    ys = fe.to_ints(p.y)
    infs = np.asarray(p.inf).reshape(-1)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


def neg(p: PointBatch) -> PointBatch:
    return PointBatch(p.x, fe.neg_mod_p(p.y), p.inf)


def add(p: PointBatch, q: PointBatch, chain_len: int = 32) -> PointBatch:
    """General batched affine addition with full edge-case handling.

    Handles P==Q (tangent), P==-Q (infinity), and either operand at
    infinity, all by lane masks. One batched inversion for the whole batch.
    """
    dx = fe.sub_mod_p(q.x, p.x)
    dy = fe.sub_mod_p(q.y, p.y)
    same_x = fe.is_zero(dx)
    same_y = fe.is_zero(dy)
    finite = ~(p.inf | q.inf)
    is_dbl = same_x & same_y & finite

    # tangent: num = 3x^2, den = 2y ; chord: num = dy, den = dx
    x_sq = fe.sqr_mod_p(p.x)
    three_x_sq = fe.add_mod_p(fe.double_mod_p(x_sq), x_sq)
    num = fe.select(is_dbl, three_x_sq, dy)
    den = fe.select(is_dbl, fe.double_mod_p(p.y), dx)

    # infinity results: P == -Q (same x, different y) or doubling a y==0 pt
    to_inf = finite & same_x & (~same_y | fe.is_zero(p.y))

    den_safe = fe.select(fe.is_zero(den), jnp.zeros_like(den).at[..., 0].set(1), den)
    inv_den = fe.batch_inv_mod_p(den_safe, chain_len=chain_len)
    lam = fe.mul_mod_p(num, inv_den)
    x3 = fe.sub_mod_p(fe.sub_mod_p(fe.sqr_mod_p(lam), p.x), q.x)
    y3 = fe.sub_mod_p(fe.mul_mod_p(lam, fe.sub_mod_p(p.x, x3)), p.y)

    # select edge cases
    out_x = fe.select(p.inf, q.x, fe.select(q.inf, p.x, x3))
    out_y = fe.select(p.inf, q.y, fe.select(q.inf, p.y, y3))
    out_inf = jnp.where(p.inf, q.inf, jnp.where(q.inf, p.inf, to_inf))
    return PointBatch(out_x, out_y, out_inf)


def double(p: PointBatch, chain_len: int = 32) -> PointBatch:
    return add(p, p, chain_len=chain_len)


def scalar_mult_batch(
    k: jnp.ndarray,
    gtable_x: jnp.ndarray,
    gtable_y: jnp.ndarray,
    chain_len: int = 32,
) -> PointBatch:
    """Batched k*G via the 32-byte-window generator table.

    ``k``: (B, 8) uint32 scalars. ``gtable_x/y``: (32, 256, 8) where entry
    [w, b] = (b * 2^(8w)) * G and b == 0 rows are unused (masked as
    infinity). 32 sequential masked batched adds — the batched re-design of
    reference ComputePublicKey (SECP256K1.cpp:61-82).
    """
    # per-window byte values, shaped (32, B): the scanned xs — the 32
    # masked adds run as ONE traced body (compile-size: ~30x smaller than
    # unrolling)
    bytes_per_window = jnp.stack(
        [
            (k[..., w // 4] >> jnp.uint32(8 * (w % 4))) & jnp.uint32(0xFF)
            for w in range(32)
        ]
    )

    def body(acc, xs):
        gx, gy, byte = xs  # gx/gy: (256, 8) window slice; byte: (B,)
        entry = PointBatch(gx[byte], gy[byte], byte == 0)
        acc = add(acc, entry, chain_len=chain_len)
        return acc, None

    acc = infinity(k.shape[:-1])
    acc, _ = jax.lax.scan(body, acc, (gtable_x, gtable_y, bytes_per_window))
    return acc


def scalar_mult_batch_jac(
    k: jnp.ndarray,
    gtable_x: jnp.ndarray,
    gtable_y: jnp.ndarray,
    chain_len: int = 32,
) -> Tuple[PointBatch, jnp.ndarray]:
    """Batched k*G via 32 JACOBIAN mixed adds + ONE final batch inversion.

    scalar_mult_batch pays a full Fermat-ladder batch inversion per
    window (32 sequential ~300-mul ladders); here the accumulator stays
    in Jacobian coordinates (8M+3S per masked mixed add, no inversions)
    and a single batch inversion normalizes at the end — ~15x fewer
    sequential modmuls for the same result.

    Returns (points, irregular): `irregular` lanes hit a doubling /
    cancellation edge case mid-ladder (probability ~2^-250 per random
    scalar — but deterministic scalars CAN trigger it) and their result
    is NOT trusted; callers must re-verify those lanes exactly on host.
    """
    bytes_per_window = jnp.stack(
        [
            (k[..., w // 4] >> jnp.uint32(8 * (w % 4))) & jnp.uint32(0xFF)
            for w in range(32)
        ]
    )

    def body(carry, xs):
        X, Y, Z, inf, irr = carry
        gx, gy, byte = xs  # (256, 8) window slice; byte: (B,)
        qx, qy = gx[byte], gy[byte]
        q_inf = byte == 0
        # mixed add (X:Y:Z) + (qx, qy): madd-2007-bl shape
        z2 = fe.sqr_mod_p(Z)
        u2 = fe.mul_mod_p(qx, z2)
        s2 = fe.mul_mod_p(qy, fe.mul_mod_p(Z, z2))
        h = fe.sub_mod_p(u2, X)
        r = fe.sub_mod_p(s2, Y)
        h_zero = fe.is_zero(h)
        edge = h_zero & ~inf & ~q_inf  # doubling (r==0) or cancellation
        h = fe.select(h_zero, _one_limbs_like(h), h)
        hh = fe.sqr_mod_p(h)
        v = fe.mul_mod_p(X, hh)
        hhh = fe.mul_mod_p(h, hh)
        x3 = fe.sub_mod_p(
            fe.sub_mod_p(fe.sqr_mod_p(r), hhh), fe.double_mod_p(v)
        )
        y3 = fe.sub_mod_p(
            fe.mul_mod_p(r, fe.sub_mod_p(v, x3)), fe.mul_mod_p(Y, hhh)
        )
        z3 = fe.mul_mod_p(Z, h)
        # P infinite -> take Q (affine, Z=1); Q infinite -> keep P
        one = _one_limbs_like(h)
        X = fe.select(q_inf, X, fe.select(inf, qx, x3))
        Y = fe.select(q_inf, Y, fe.select(inf, qy, y3))
        Z = fe.select(q_inf, Z, fe.select(inf, one, z3))
        inf = inf & q_inf
        return (X, Y, Z, inf, irr | edge), None

    z0 = jnp.zeros(k.shape, dtype=jnp.uint32)
    inf0 = jnp.ones(k.shape[:-1], dtype=bool)
    irr0 = jnp.zeros(k.shape[:-1], dtype=bool)
    (X, Y, Z, inf, irr), _ = jax.lax.scan(
        body,
        (z0, z0, _one_limbs_like(z0), inf0, irr0),
        (gtable_x, gtable_y, bytes_per_window),
    )
    z_safe = fe.select(fe.is_zero(Z), _one_limbs_like(Z), Z)
    zi = fe.batch_inv_mod_p(z_safe, chain_len=chain_len)
    zi2 = fe.sqr_mod_p(zi)
    x = fe.mul_mod_p(X, zi2)
    y = fe.mul_mod_p(Y, fe.mul_mod_p(zi, zi2))
    return PointBatch(x, y, inf), irr


def _one_limbs_like(a: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(a)
    return z.at[..., 0].set(1)


def verify_on_curve_host(p: PointBatch) -> bool:
    """Host-side check that all finite batch points satisfy y^2 = x^3 + 7."""
    for pt in point_batch_to_ints(p):
        if not ecref.is_on_curve(pt):
            return False
    return True
