"""Pallas TPU kernels for the BSGS giant-step walk.

Why kernels: the XLA walk pays per-HLO-op dispatch on long serial chains
(the Fermat inversion ladder and per-step scan) — measured 6.5 ms/step at
U = 8192 on v5e. In Pallas the same chains are straight-line vector code.

Two-kernel restructure of the chunk (replaces the lax.scan of
walk.walk_fused steps):

- **Kernel A — advance chain**: the K per-step base points are a serial
  dependency (P_{s+1} = P_s + ADV). Computing them with per-step affine
  adds would need one inversion per step; instead the chain runs in
  Jacobian coordinates (8M+3S mixed adds, no inversions), then ALL K Z's
  are batch-inverted with one addition-chain powering and normalized.
  Per-chunk serial cost: ~11K muls + 1 powering, vs K powerings before.

- **Kernel B — walk blocks**: with the K bases known, the K*U walk
  additions are fully parallel. Grid over blocks of SB steps; each block
  batch-inverts its SB*U denominators via grouped Montgomery chains
  (fe_tiles.montgomery_inv_groups, one powering per block) and emits the
  64-bit x-truncations (qhi/qlo) plus degenerate-lane masks.

Membership (bitmap cascade + exact search) stays in XLA on the kernel
outputs — gathers are XLA's job.

Layout: everything limb-major (8, rows, 128) uint32 (fe_tiles).
Kernel A carries up to 128 independent chains on its lanes (one per
target — pallas_chunk_multi); kernel B receives bases pre-blocked
(8, SB, 128) per grid step so T*K never caps VMEM, and uses real lane
parallelism across the U offsets.

Reference capability: the giant-step walk of thread_process_bsgs
(keyhunt.cpp:3873-4002); the unwired CUDA kernel's per-step Fermat
inversion (cuda/bsgs_kernel.cu:159-165) is exactly the design this
avoids.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fe_tiles as ft

LANES = 128


# ---------------------------------------------------------------------------
# Kernel A: Jacobian advance chain + batched normalization
# ---------------------------------------------------------------------------


def _mixed_add(X, Y, Z, qx, qy):
    """Jacobian P + affine Q (madd-2007-bl shape, 8M+3S) with a
    branch-free Jacobian DOUBLING fallback (dbl-2009-l, a=0) for the
    P == Q case — the baby-table build chain hits it deterministically
    at its first advance (ub*G + ub*G). Returns (X3, Y3, Z3, inf) where
    `inf` flags P == -Q (sum is the point at infinity): the result is
    garbage and the caller must treat the lane as degenerate."""
    z2 = ft.sqr(Z)
    u2 = ft.mul(qx, z2)
    s2 = ft.mul(qy, ft.mul(Z, z2))
    h = ft.sub(u2, X)
    r = ft.sub(s2, Y)
    h_zero = ft.is_zero(h)
    is_dbl = h_zero & ft.eq(s2, Y)
    h = ft.select(h_zero, ft.one_like(h), h)
    hh = ft.sqr(h)
    v = ft.mul(X, hh)
    hhh = ft.mul(h, hh)
    x3 = ft.sub(ft.sub(ft.sqr(r), hhh), ft.dbl(v))
    y3 = ft.sub(ft.mul(r, ft.sub(v, x3)), ft.mul(Y, hhh))
    z3 = ft.mul(Z, h)
    # doubling lane: 2P for a = 0 (secp256k1)
    a_ = ft.sqr(X)
    b_ = ft.sqr(Y)
    c_ = ft.sqr(b_)
    t = ft.sqr(ft.add(X, b_))
    d_ = ft.dbl(ft.sub(ft.sub(t, a_), c_))
    e_ = ft.add(ft.dbl(a_), a_)
    xd = ft.sub(ft.sqr(e_), ft.dbl(d_))
    yd = ft.sub(ft.mul(e_, ft.sub(d_, xd)), ft.dbl(ft.dbl(ft.dbl(c_))))
    zd = ft.dbl(ft.mul(Y, Z))
    x3 = ft.select(is_dbl, xd, x3)
    y3 = ft.select(is_dbl, yd, y3)
    z3 = ft.select(is_dbl, zd, z3)
    return x3, y3, z3, h_zero & ~is_dbl


def _advance_kernel(px_ref, py_ref, advx_ref, advy_ref,
                    bx_ref, by_ref, deg_ref,
                    xs, ys, zs, K: int):
    """Scratch xs/ys/zs: (8, K, 128). Outputs: normalized chain points
    P+ADV..P+K*ADV (8, K, 128) x2, adv_deg (K, 128) u32.

    The K-step chain is a fori_loop (one mixed-add body) — an unrolled
    chain of K mul-heavy bodies crashes/stalls the Mosaic compiler."""
    qx = advx_ref[:, 0]
    qy = advy_ref[:, 0]

    def body(s, carry):
        X, Y, Z = carry
        X, Y, Z, hz = _mixed_add(X, Y, Z, qx, qy)
        deg_ref[pl.ds(s, 1)] = hz.astype(jnp.uint32)[None]
        # once degenerate, Z becomes 0 downstream; keep it invertible
        Z = ft.select(ft.is_zero(Z), ft.one_like(Z), Z)
        xs[:, pl.ds(s, 1), :] = X[:, None]
        ys[:, pl.ds(s, 1), :] = Y[:, None]
        zs[:, pl.ds(s, 1), :] = Z[:, None]
        return X, Y, Z

    X0, Y0 = px_ref[:, 0], py_ref[:, 0]
    jax.lax.fori_loop(0, K, body, (X0, Y0, ft.one_like(X0)))
    # batch-invert all K Z's: group chains over sublane-rows of 8
    z_all = zs[:, :, :]
    zinv = ft.montgomery_inv_groups(z_all, n_groups=max(1, K // 8))
    zi2 = ft.sqr(zinv)
    # rows 0..K-1 = normalized chain points P+ADV .. P+K*ADV; the caller
    # shifts them into walk-base order in XLA (a sublane-offset write like
    # bx_ref[:, 1:K] = ... crashes Mosaic's LLO lowering)
    bx_ref[:, :, :] = ft.mul(xs[:, :, :], zi2)
    by_ref[:, :, :] = ft.mul(ys[:, :, :], ft.mul(zinv, zi2))


def advance_chain(px, py, adv_x, adv_y, K: int, interpret: bool = False):
    """px/py: (8, 1, 128) lane-replicated affine base. adv_*: (8, 1, 128).
    Returns walk bases (8, K, 128) x2 (row 0 = input state), next state
    (8, 1, 128) x2, adv_deg (K, 128) u32."""
    spec1 = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((8, K, LANES), jnp.uint32),
        jax.ShapeDtypeStruct((8, K, LANES), jnp.uint32),
        jax.ShapeDtypeStruct((K, LANES), jnp.uint32),
    )
    cx, cy, adeg = pl.pallas_call(
        functools.partial(_advance_kernel, K=K),
        out_shape=out_shapes,
        in_specs=[spec1] * 4,
        out_specs=(spec1,) * 3,
        scratch_shapes=[
            pltpu.VMEM((8, K, LANES), jnp.uint32),
            pltpu.VMEM((8, K, LANES), jnp.uint32),
            pltpu.VMEM((8, K, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(px, py, adv_x, adv_y)
    # shift into walk-base order in XLA: base_0 = input, base_s = chain_{s-1}
    bases_x = jnp.concatenate([px, cx[:, : K - 1]], axis=1)
    bases_y = jnp.concatenate([py, cy[:, : K - 1]], axis=1)
    next_x = cx[:, K - 1 :]
    next_y = cy[:, K - 1 :]
    return bases_x, bases_y, next_x, next_y, adeg


# ---------------------------------------------------------------------------
# Kernel B: parallel walk blocks
# ---------------------------------------------------------------------------


def _group_inverse_inplace(dens, prefs, ng: int) -> None:
    """Grouped-Montgomery batch inverse of the (8, ng*8, 128) denominators
    in `dens`, IN PLACE (dens becomes the inverses), using `prefs` as the
    prefix-product scratch. ONE addition-chain inversion total. Zero
    denominators must have been masked to 1 by the caller."""
    first = dens[:, pl.ds(0, 8), :]
    prefs[:, pl.ds(0, 8), :] = first

    def fwd(gi, carry):
        nxt = ft.mul(carry, dens[:, pl.ds(gi * 8, 8), :])
        prefs[:, pl.ds(gi * 8, 8), :] = nxt
        return nxt

    total = jax.lax.fori_loop(1, ng, fwd, first)
    running = ft.inv(total)

    def bwd(i, carry):
        gi = ng - 1 - i
        x = dens[:, pl.ds(gi * 8, 8), :]
        pv = prefs[:, pl.ds((gi - 1) * 8, 8), :]
        inv_gi = ft.mul(carry, pv)
        carry = ft.mul(carry, x)
        dens[:, pl.ds(gi * 8, 8), :] = inv_gi  # reuse dens as the inverse buffer
        return carry

    running = jax.lax.fori_loop(0, ng - 1, bwd, running)
    dens[:, pl.ds(0, 8), :] = running


def _walk_kernel(bx_ref, by_ref, tabx_ref, taby_ref,
                 qlo_ref, qhi_ref, deg_ref, dens, prefs, SB: int, U: int):
    """One grid block: SB steps x U offsets. tab: (8, U/128, 128).
    bases: full (8, K, 128) (lane-replicated rows), sliced by grid id.
    Outputs (SB, U/128, 128). Scratch dens/prefs: (8, SB*rows, 128).

    Every mul-heavy stage is a fori_loop over groups/steps — compact
    kernel code (Mosaic chokes on hundreds of unrolled mul bodies).
    """
    rows = U // LANES
    tx = tabx_ref[:, :, :]  # (8, rows, 128)
    ty = taby_ref[:, :, :]
    # bases arrive in (8, RB, 128) blocks (RB = min(8, K): Mosaic needs
    # sublane-divisible blocks); this grid step's rows start at `off`
    rb = bx_ref.shape[1]
    off = (pl.program_id(0) * SB) % rb
    # bases arrive pre-blocked (8, SB, 128): only this block's rows live
    # in VMEM, so T*K (multi-target) no longer caps chunk size

    def build(s, _):
        bx = jnp.broadcast_to(bx_ref[:, pl.ds(off + s, 1), :], tx.shape)
        dx = ft.sub(tx, bx)
        degrow = ft.is_zero(dx)  # (rows, 128)
        dx = ft.select(degrow, ft.one_like(dx), dx)
        dens[:, pl.ds(s * rows, rows), :] = dx
        deg_ref[pl.ds(s, 1)] = degrow.astype(jnp.uint32)[None]
        return 0

    jax.lax.fori_loop(0, SB, build, 0)
    _group_inverse_inplace(dens, prefs, (SB * rows) // 8)

    def emit(s, _):
        bx = jnp.broadcast_to(bx_ref[:, pl.ds(off + s, 1), :], tx.shape)
        by = jnp.broadcast_to(by_ref[:, pl.ds(off + s, 1), :], ty.shape)
        inv_s = dens[:, pl.ds(s * rows, rows), :]
        lam = ft.mul(ft.sub(ty, by), inv_s)
        # only limbs 0/1 of x3 leave the kernel (64-bit truncation)
        x3 = ft.sub(ft.sub(ft.sqr(lam), bx), tx)
        qlo_ref[pl.ds(s, 1)] = x3[0][None]
        qhi_ref[pl.ds(s, 1)] = x3[1][None]
        return 0

    jax.lax.fori_loop(0, SB, emit, 0)


def walk_blocks(bases_x, bases_y, tab_x, tab_y, U: int, SB: int = 4,
                interpret: bool = False):
    """bases: (8, K, 128); tab: (8, U/128, 128). Returns qlo, qhi, deg
    each (K, U/128, 128) uint32."""
    K = bases_x.shape[1]
    assert K % SB == 0, (K, SB)
    rows = U // LANES
    if (SB * rows) % 8 != 0 or SB * rows < 8:
        raise ValueError(
            f"walk_blocks needs SB*U/128 to be a positive multiple of 8 "
            f"(got SB={SB}, U={U}): the Montgomery grouping would be empty"
        )
    grid = (K // SB,)
    rb = min(8, K)  # base block rows: sublane-divisible or full
    if rb % SB != 0:
        raise ValueError(f"SB must divide {rb} (got SB={SB}, K={K})")
    base_spec = pl.BlockSpec((8, rb, LANES), lambda g: (0, (g * SB) // rb, 0),
                             memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((8, rows, LANES), lambda g: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SB, rows, LANES), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((K, rows, LANES), jnp.uint32) for _ in range(3)
    )
    return pl.pallas_call(
        functools.partial(_walk_kernel, SB=SB, U=U),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[base_spec, base_spec, tab_spec, tab_spec],
        out_specs=(out_spec,) * 3,
        scratch_shapes=[
            pltpu.VMEM((8, SB * rows, LANES), jnp.uint32),
            pltpu.VMEM((8, SB * rows, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(bases_x, bases_y, tab_x, tab_y)


# ---------------------------------------------------------------------------
# Host-facing chunk: kernels + layout glue
# ---------------------------------------------------------------------------


class PallasChunkResult(NamedTuple):
    next_x: jnp.ndarray  # (8,) uint32 limbs (batch-major order)
    next_y: jnp.ndarray
    qhi: jnp.ndarray  # (K, U) uint32
    qlo: jnp.ndarray  # (K, U) uint32
    degenerate: jnp.ndarray  # (K, U) bool
    adv_degenerate: jnp.ndarray  # (K,) bool


def pallas_chunk(px, py, tab_x_lm, tab_y_lm, adv_x_lm, adv_y_lm,
                 K: int, U: int, SB: int = 4,
                 interpret: bool = False) -> PallasChunkResult:
    """px/py: (8,) uint32 limbs of the single target's base point.
    tab_*_lm: (8, U/128, 128) limb-major offset table. adv_*_lm: (8,).
    """
    rep = lambda v: jnp.broadcast_to(v[:, None, None], (8, 1, LANES))
    bx, by, nx, ny, adeg = advance_chain(
        rep(px), rep(py), rep(adv_x_lm), rep(adv_y_lm), K, interpret=interpret
    )
    qlo, qhi, deg = walk_blocks(bx, by, tab_x_lm, tab_y_lm, U, SB=SB,
                                interpret=interpret)
    return PallasChunkResult(
        nx[:, 0, 0],
        ny[:, 0, 0],
        qhi.reshape(K, U),
        qlo.reshape(K, U),
        deg.reshape(K, U) != 0,
        adeg[:, 0] != 0,
    )


def table_to_limb_major(tab_bm: np.ndarray) -> jnp.ndarray:
    """(U, 8) host batch-major table -> (8, U/128, 128) device limb-major."""
    u = tab_bm.shape[0]
    return jnp.asarray(np.ascontiguousarray(tab_bm.T).reshape(8, u // LANES, LANES))


# ---------------------------------------------------------------------------
# Multi-target chunk: T independent walks sharing ONE advance-chain kernel
# ---------------------------------------------------------------------------


class PallasChunkMultiResult(NamedTuple):
    next_x: jnp.ndarray  # (T, 8) uint32 limbs
    next_y: jnp.ndarray
    qhi: jnp.ndarray  # (T*K, U) uint32, block index = t*K + s
    qlo: jnp.ndarray
    degenerate: jnp.ndarray  # (T*K, U) bool
    adv_degenerate: jnp.ndarray  # (T, K) bool


def pallas_chunk_multi(px_bm, py_bm, tab_x_lm, tab_y_lm, adv_x_lm, adv_y_lm,
                       K: int, U: int, T: int, SB: int = 4,
                       interpret: bool = False) -> PallasChunkMultiResult:
    """px/py: (T, 8) limbs, one target walk base per row.

    The advance chain is elementwise across lanes, so ALL T chains run in
    ONE kernel-A call with target t in lane t (the lane replication of the
    single-target path was redundant compute anyway). The walk kernel then
    grids over T*K blocks — total query count scales with T, matching the
    reference's per-pubkey hot loop (keyhunt.cpp:3859-3869), but the
    serial chain cost is shared.

    T > 128 splits into lane-width groups, one kernel-A call each, and
    concatenates block rows in group order — identical global t*K + s
    block indexing, so callers never see the grouping. Memory (not lane
    count) becomes the cap: the query arrays grow as T*K*U words.
    """
    if T > LANES:
        parts = [
            pallas_chunk_multi(
                px_bm[g : g + LANES], py_bm[g : g + LANES],
                tab_x_lm, tab_y_lm, adv_x_lm, adv_y_lm,
                K=K, U=U, T=min(LANES, T - g), SB=SB, interpret=interpret,
            )
            for g in range(0, T, LANES)
        ]
        cat = lambda xs: jnp.concatenate(xs, axis=0)
        return PallasChunkMultiResult(
            cat([p.next_x for p in parts]),
            cat([p.next_y for p in parts]),
            cat([p.qhi for p in parts]),
            cat([p.qlo for p in parts]),
            cat([p.degenerate for p in parts]),
            cat([p.adv_degenerate for p in parts]),
        )
    # lane-pack: lane t carries target t; pad lanes repeat target 0
    pad = jnp.broadcast_to(px_bm[0][:, None], (8, LANES - T))
    px_l = jnp.concatenate([jnp.transpose(px_bm, (1, 0)), pad], axis=1)[:, None, :]
    pad = jnp.broadcast_to(py_bm[0][:, None], (8, LANES - T))
    py_l = jnp.concatenate([jnp.transpose(py_bm, (1, 0)), pad], axis=1)[:, None, :]
    rep = lambda v: jnp.broadcast_to(v[:, None, None], (8, 1, LANES))
    bx, by, nx, ny, adeg = advance_chain(
        px_l, py_l, rep(adv_x_lm), rep(adv_y_lm), K, interpret=interpret
    )
    # per-target lane-broadcast bases: (8, T*K, 128), block i = t*K + s
    bxs = [jnp.broadcast_to(bx[:, :, t : t + 1], bx.shape[:2] + (LANES,))
           for t in range(T)]
    bys = [jnp.broadcast_to(by[:, :, t : t + 1], by.shape[:2] + (LANES,))
           for t in range(T)]
    bx_all = jnp.concatenate(bxs, axis=1)
    by_all = jnp.concatenate(bys, axis=1)
    qlo, qhi, deg = walk_blocks(bx_all, by_all, tab_x_lm, tab_y_lm, U, SB=SB,
                                interpret=interpret)
    return PallasChunkMultiResult(
        jnp.transpose(nx[:, 0, :T], (1, 0)),
        jnp.transpose(ny[:, 0, :T], (1, 0)),
        qhi.reshape(T * K, U),
        qlo.reshape(T * K, U),
        deg.reshape(T * K, U) != 0,
        jnp.transpose(adeg[:, :T], (1, 0)) != 0,
    )
