"""Brute-force scanning engines: address / rmd160 / xpoint / eth.

TPU re-design of the reference's thread_process (keyhunt.cpp:2511-3099):
instead of per-thread 1024-point sequential walks with mutex range claims,
W independent walkers each own a disjoint contiguous slice of the range
and every device step advances all walkers by a (2U+1)-key window computed
with ONE batched inversion (symmetric group walk around each walker's
center).

Key window algebra for walker w at device step s:
    k0(w, s)  = a + w * slice_len + s * (2U + 1)
    center    = k0 + U        (point state on device)
    covered   = { k0 .. k0 + 2U }  via  center - u, center, center + u

Hash modes hash BOTH compressed parities of each X (reference
GetHash160_fromX, SECP256K1.cpp:746-790), so a device hit yields candidate
scalars {k, n - k}; the host verifies exactly against the full 20-byte
target (parity/negation correction — reference keyhunt.cpp:2800-2851).

Modes:
- 'xpoint'  : match X coordinates directly (no hashing) — keyhunt -m xpoint
- 'rmd160'  : match hash160(compressed pubkey) — keyhunt -m rmd160
- 'address' : same pipeline, targets parsed from base58 — keyhunt -m address
- 'address_u': uncompressed (04||x||y) hash160 (full walk computes y)
- 'eth'     : keccak256(x||y)[12:] (full walk) — keyhunt -m address ETH mode
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import points, tables, walk
from ..field import fe
from ..filter import sorted_table as st
from ..hash import (
    hash160_from_x_both_parities,
    hash160_from_xy,
    keccak256_pubkey64,
)
from ..ref import ecref, hashref
from ..utils.targets import TargetSet
from .common import FoundKey, SearchStats


@dataclass(frozen=True)
class BruteParams:
    walkers: int = 4  # W independent walkers
    block_u: int = 256  # U: symmetric offsets (window = 2U+1 keys)
    steps_per_chunk: int = 8  # K: device steps per jit call
    chain_len: int = 32
    endo: bool = False  # GLV endomorphism lanes (reference -e):
    # also check beta*x and beta^2*x, covering lambda*k and lambda^2*k
    # for 2 extra modmuls per point (keyhunt.cpp:2646-2677)


class BruteEngine:
    def __init__(
        self,
        targets: TargetSet,
        range_start: int,
        range_end: int,
        mode: str = "rmd160",
        params: BruteParams = BruteParams(),
        compressed: bool = True,
    ):
        if mode not in ("xpoint", "rmd160", "address", "address_u", "eth"):
            raise ValueError(f"bad mode {mode}")
        if not (1 <= range_start < range_end <= ecref.N):
            raise ValueError("bad range")
        self.mode = "rmd160" if mode == "address" else mode
        self.targets = targets
        self.table = targets.build_table()
        self.a = range_start
        self.b = range_end
        self.p = params
        self.stats = SearchStats()

        # keys-covered accounting multipliers (reference keyhunt.cpp:2175-2187)
        mult = 1
        if self.mode in ("rmd160",):
            mult = 2  # both parities cover k and n-k
        if params.endo and self.mode in ("rmd160", "xpoint"):
            mult *= 3
        self.stats.multiplier = mult

        self.window = 2 * params.block_u + 1
        total_keys = self.b - self.a
        self.slice_len = math.ceil(total_keys / params.walkers)
        # round the slice up to whole windows so walkers stay aligned
        self.slice_len = math.ceil(self.slice_len / self.window) * self.window
        self.steps_per_walker = self.slice_len // self.window

        tab_x, tab_y = tables.step_table(ecref.G, params.block_u)
        self.tab_x = jnp.asarray(tab_x)
        self.tab_y = jnp.asarray(tab_y)
        adv = ecref.scalar_mult(self.window)
        self.adv_pt = points.point_batch_from_ints([adv] * params.walkers)
        self._chunk_fn = self._make_chunk_fn()

    # ------------------------------------------------------------------

    def _initial_centers(self, step0: int = 0) -> points.PointBatch:
        pts = []
        for w in range(self.p.walkers):
            c = self.a + w * self.slice_len + step0 * self.window + self.p.block_u
            pts.append(ecref.scalar_mult(c))
        return points.point_batch_from_ints(pts)

    def _make_chunk_fn(self):
        W = self.p.walkers
        U = self.p.block_u
        K = self.p.steps_per_chunk
        chain = self.p.chain_len
        mode = self.mode
        table = self.table
        tab_x, tab_y = self.tab_x, self.tab_y
        adv = self.adv_pt

        def queries_from_x(x_all):
            """x_all: (W, npts, 8) -> bool hit mask (W, npts, V) and the
            matched target row (V variants per point)."""
            if mode == "xpoint":
                qhi, qlo = st.trunc64_from_limbs(x_all)
                lr = st.lookup(table, qhi.reshape(-1), qlo.reshape(-1))
                hit = (lr.found | lr.found2).reshape(*x_all.shape[:-1], 1)
                row = lr.idx.reshape(*x_all.shape[:-1], 1)
                return hit, row
            if mode == "rmd160":
                even, odd = hash160_from_x_both_parities(x_all)
                he = st.lookup(table, even[1].reshape(-1), even[0].reshape(-1))
                ho = st.lookup(table, odd[1].reshape(-1), odd[0].reshape(-1))
                hit = jnp.stack(
                    [
                        (he.found | he.found2).reshape(x_all.shape[:-1]),
                        (ho.found | ho.found2).reshape(x_all.shape[:-1]),
                    ],
                    axis=-1,
                )
                row = jnp.stack(
                    [
                        he.idx.reshape(x_all.shape[:-1]),
                        ho.idx.reshape(x_all.shape[:-1]),
                    ],
                    axis=-1,
                )
                return hit, row
            raise AssertionError

        def queries_from_xy(x_all, y_all):
            if mode == "eth":
                words = keccak256_pubkey64(x_all, y_all)
            else:  # address_u
                words = hash160_from_xy(x_all, y_all)
            lr = st.lookup(table, words[1].reshape(-1), words[0].reshape(-1))
            hit = (lr.found | lr.found2).reshape(*x_all.shape[:-1], 1)
            row = lr.idx.reshape(*x_all.shape[:-1], 1)
            return hit, row

        needs_y = mode in ("eth", "address_u")
        endo = self.p.endo
        beta = fe.from_int(ecref.BETA)
        beta2 = fe.from_int(ecref.BETA * ecref.BETA % ecref.P)

        def endo_variants(x_all):
            """[(x, endo_power)] lanes: phi^e(P) = (beta^e x, y) = lambda^e k G."""
            variants = [x_all]
            if endo:
                variants.append(fe.mul_mod_p(x_all, beta))
                variants.append(fe.mul_mod_p(x_all, beta2))
            return variants

        @jax.jit
        def chunk(cx, cy):
            def body(carry, _):
                cx, cy = carry
                ctr = points.PointBatch(cx, cy, jnp.zeros((W,), dtype=bool))
                if needs_y:
                    res = walk.full_walk(ctr, tab_x, tab_y, symmetric=True, chain_len=chain)
                    x_all = jnp.concatenate(
                        [res.x_plus, res.x_minus, cx[:, None, :]], axis=1
                    )
                    y_all = jnp.concatenate(
                        [res.y_plus, res.y_minus, cy[:, None, :]], axis=1
                    )
                    hits, rows = [], []
                    for xv in endo_variants(x_all):
                        h, r = queries_from_xy(xv, y_all)
                        hits.append(h)
                        rows.append(r)
                    hit = jnp.concatenate(hits, axis=-1)
                    row = jnp.concatenate(rows, axis=-1)
                    deg = res.degenerate
                else:
                    res = walk.xonly_walk(ctr, tab_x, tab_y, symmetric=True, chain_len=chain)
                    x_all = jnp.concatenate(
                        [res.x_plus, res.x_minus, cx[:, None, :]], axis=1
                    )
                    hits, rows = [], []
                    for xv in endo_variants(x_all):
                        h, r = queries_from_x(xv)
                        hits.append(h)
                        rows.append(r)
                    hit = jnp.concatenate(hits, axis=-1)
                    row = jnp.concatenate(rows, axis=-1)
                    deg = res.degenerate
                # mask degenerate lanes (both + and - outputs invalid)
                degm = jnp.concatenate(
                    [deg, deg, jnp.zeros((W, 1), dtype=bool)], axis=1
                )
                hit = hit & ~degm[..., None]
                nxt = walk.advance(ctr, adv, chain_len=1)
                return (nxt.x, nxt.y), (hit, row, deg)

            (cx, cy), outs = jax.lax.scan(body, (cx, cy), None, length=K)
            return cx, cy, outs

        return chunk

    # ------------------------------------------------------------------

    def _key_for_lane(self, step: int, w: int, lane: int) -> int:
        """Scalar for point lane: 0..U-1 = +u, U..2U-1 = -u, 2U = center."""
        u = self.p.block_u
        k0 = self.a + w * self.slice_len + step * self.window
        center = k0 + u
        if lane < u:
            return center + (lane + 1)
        if lane < 2 * u:
            return center - (lane - u + 1)
        return center

    def _verify(self, k: int, row: int) -> Optional[FoundKey]:
        """Exact host check of candidate scalar k against target row."""
        for cand in (k, ecref.N - (k % ecref.N)):
            if not (1 <= cand < ecref.N):
                continue
            pt = ecref.scalar_mult(cand)
            if self.mode == "xpoint":
                got = pt[0].to_bytes(32, "big")
            elif self.mode == "rmd160":
                got = hashref.pubkey_to_hash160(pt, compressed=True)
            elif self.mode == "address_u":
                got = hashref.pubkey_to_hash160(pt, compressed=False)
            else:  # eth
                got = hashref.pubkey_to_eth_address(pt)
            # check the indicated row first, then full set (trunc dup safety)
            if got == self.targets.raw[row] or got in self.targets.raw:
                label = (
                    self.targets.labels[row]
                    if got == self.targets.raw[row]
                    else self.targets.labels[self.targets.raw.index(got)]
                )
                return FoundKey(
                    private_key=cand,
                    pubkey=pt,
                    compressed=self.mode != "address_u",
                    target=label,
                )
        return None

    def search(
        self,
        max_steps: Optional[int] = None,
        stop_on_first: bool = False,
        progress_every: int = 0,
    ) -> List[FoundKey]:
        p = self.p
        base = self._initial_centers()
        cx, cy = base.x, base.y
        total = self.steps_per_walker if max_steps is None else min(
            self.steps_per_walker, max_steps
        )
        found: List[FoundKey] = []
        seen = set()
        step = 0
        while step < total:
            k = min(p.steps_per_chunk, total - step)
            cx, cy, (hit, row, deg) = self._chunk_fn(cx, cy)
            hit_np = np.asarray(hit)  # (K, W, npts, V)
            deg_np = np.asarray(deg)  # (K, W, U)
            if hit_np[:k].any():
                row_np = np.asarray(row)
                base_v = 2 if self.mode == "rmd160" else 1
                lam_pow = (1, ecref.LAMBDA, ecref.LAMBDA * ecref.LAMBDA % ecref.N)
                for s, w, lane, v in zip(*np.nonzero(hit_np[:k])):
                    cand = self._key_for_lane(step + int(s), int(w), int(lane))
                    e = int(v) // base_v  # endomorphism lane: key = lambda^e * k
                    if e:
                        cand = cand * lam_pow[e] % ecref.N
                    fk = self._verify(cand, int(row_np[s, w, lane, v]))
                    if fk and fk.private_key not in seen:
                        seen.add(fk.private_key)
                        found.append(fk)
                        if stop_on_first:
                            return found
            if deg_np[:k].any():
                # degenerate lane u0: x(center) == x((u0+1)G), i.e. the
                # center scalar c is +-(u0+1) mod n. The +-(u0+1) walk
                # outputs are invalid, so enumerate everything they could
                # have covered exactly: c itself (= u0+1 or n-(u0+1)),
                # the doubling lane c + (u0+1) = 2c, and c - (u0+1) = 0
                # (no key). All verified against the full target set.
                for s, w, u0 in zip(*np.nonzero(deg_np[:k])):
                    c = self._key_for_lane(step + int(s), int(w), 2 * p.block_u)
                    for cand in (int(u0) + 1, ecref.N - (int(u0) + 1), (2 * c) % ecref.N):
                        fk = self._verify(cand, 0)
                        if fk and fk.private_key not in seen:
                            seen.add(fk.private_key)
                            found.append(fk)
            self.stats.add(k * p.walkers * self.window)
            step += p.steps_per_chunk
            if progress_every and (step // p.steps_per_chunk) % progress_every == 0:
                print(f"[brute] step {step}/{total} {self.stats.human()}")
        return found
