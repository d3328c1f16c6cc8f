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
    stride: int = 1  # key-space stride (reference -I): scan
    # {a, a+stride, a+2*stride, ...}; the walk table becomes multiples of
    # stride*G so device cost is unchanged (keyhunt.cpp stride handling
    # in thread_process, :2586-2590)
    random_mode: bool = False  # reference -R: walkers re-base to random
    # window-aligned positions every chunk instead of scanning sequentially
    # (keyhunt.cpp:2547-2568 random base claims)
    seed: int = 0


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
        # index space: key(j) = a + j*stride, j in [0, total_idx)
        self.stride = params.stride
        if self.stride < 1:
            raise ValueError("stride must be >= 1")
        total_idx = math.ceil((self.b - self.a) / self.stride)
        self.slice_len = math.ceil(total_idx / params.walkers)
        # round the slice up to whole windows so walkers stay aligned
        self.slice_len = math.ceil(self.slice_len / self.window) * self.window
        self.steps_per_walker = self.slice_len // self.window
        self.total_steps = self.steps_per_walker * params.walkers

        step_pt = ecref.scalar_mult(self.stride)
        tab_x, tab_y = tables.step_table(step_pt, params.block_u)
        self.tab_x = jnp.asarray(tab_x)
        self.tab_y = jnp.asarray(tab_y)
        adv = ecref.scalar_mult(self.window * self.stride)
        self.adv_x = fe.from_int(adv[0])
        self.adv_y = fe.from_int(adv[1])
        self._chunk_fn = self._make_chunk_fn()

    # ------------------------------------------------------------------

    def _centers_for_bases(self, bases: Sequence[int]) -> points.PointBatch:
        """Walker centers for per-walker window-start indices `bases`
        (flat index units: key = a + idx*stride)."""
        pts = []
        for w, base_idx in enumerate(bases):
            c = self.a + (base_idx + self.p.block_u) * self.stride
            pts.append(ecref.scalar_mult(c))
        return points.point_batch_from_ints(pts)

    def _sequential_bases(self, step0: int = 0) -> List[int]:
        return [
            w * self.slice_len + step0 * self.window
            for w in range(self.p.walkers)
        ]

    def _make_chunk_fn(self):
        W = self.p.walkers
        U = self.p.block_u
        K = self.p.steps_per_chunk
        chain = self.p.chain_len
        mode = self.mode
        table = self.table
        tab_x, tab_y = self.tab_x, self.tab_y

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
        adv_x, adv_y = self.adv_x, self.adv_y

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
                res = walk.walk_fused(
                    ctr, tab_x, tab_y, adv_x, adv_y,
                    symmetric=True, need_y=needs_y, chain_len=chain,
                )
                x_all = jnp.concatenate(
                    [res.x_plus, res.x_minus, cx[:, None, :]], axis=1
                )
                hits, rows = [], []
                if needs_y:
                    y_all = jnp.concatenate(
                        [res.y_plus, res.y_minus, cy[:, None, :]], axis=1
                    )
                    for xv in endo_variants(x_all):
                        h, r = queries_from_xy(xv, y_all)
                        hits.append(h)
                        rows.append(r)
                else:
                    for xv in endo_variants(x_all):
                        h, r = queries_from_x(xv)
                        hits.append(h)
                        rows.append(r)
                hit = jnp.concatenate(hits, axis=-1)
                row = jnp.concatenate(rows, axis=-1)
                # mask degenerate lanes (both + and - outputs invalid)
                degm = jnp.concatenate(
                    [res.degenerate, res.degenerate, jnp.zeros((W, 1), dtype=bool)],
                    axis=1,
                )
                hit = hit & ~degm[..., None]
                # deg summary: U walk lanes + 1 advance lane
                deg = jnp.concatenate(
                    [res.degenerate, res.adv_degenerate[:, None]], axis=1
                )
                return (res.adv_x, res.adv_y), (hit, row, deg)

            (cx, cy), outs = jax.lax.scan(body, (cx, cy), None, length=K)
            return cx, cy, outs

        return chunk

    # ------------------------------------------------------------------

    def _key_for_lane(self, base_idx: int, s: int, lane: int) -> int:
        """Scalar for point lane of step s from window-start index base_idx:
        lanes 0..U-1 = +u, U..2U-1 = -u, 2U = center."""
        u = self.p.block_u
        center = base_idx + s * self.window + u
        if lane < u:
            idx = center + (lane + 1)
        elif lane < 2 * u:
            idx = center - (lane - u + 1)
        else:
            idx = center
        return self.a + idx * self.stride

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
        total = self.steps_per_walker if max_steps is None else min(
            self.steps_per_walker, max_steps
        )
        found: List[FoundKey] = []
        seen = set()
        step = 0
        rng = np.random.default_rng(p.seed) if p.random_mode else None
        bases = self._sequential_bases()
        base_pts = self._centers_for_bases(bases)
        cx, cy = base_pts.x, base_pts.y
        while step < total:
            k = min(p.steps_per_chunk, total - step)
            if rng is not None:
                # random mode: every chunk, each walker re-bases to a
                # uniform window-aligned position anywhere in the range
                # (reference -R random base claims, keyhunt.cpp:2547-2568);
                # the chunk then scans K consecutive windows from there.
                max_start = max(1, self.total_steps - p.steps_per_chunk)
                starts = rng.integers(0, max_start, size=p.walkers)
                bases = [int(s0) * self.window for s0 in starts]
                base_pts = self._centers_for_bases(bases)
                cx, cy = base_pts.x, base_pts.y
            cx, cy, (hit, row, deg) = self._chunk_fn(cx, cy)
            hit_np = np.asarray(hit)  # (K, W, npts, V)
            deg_np = np.asarray(deg)  # (K, W, U)
            if hit_np[:k].any():
                row_np = np.asarray(row)
                base_v = 2 if self.mode == "rmd160" else 1
                lam_pow = (1, ecref.LAMBDA, ecref.LAMBDA * ecref.LAMBDA % ecref.N)
                for s, w, lane, v in zip(*np.nonzero(hit_np[:k])):
                    cand = self._key_for_lane(bases[int(w)], int(s), int(lane))
                    e = int(v) // base_v  # endomorphism lane: key = lambda^e * k
                    if e:
                        cand = cand * lam_pow[e] % ecref.N
                    fk = self._verify(cand, int(row_np[s, w, lane, v]))
                    if fk and fk.private_key not in seen:
                        seen.add(fk.private_key)
                        found.append(fk)
                        if stop_on_first:
                            return found
            rebase = False
            if deg_np[:k].any():
                # degenerate lane u0 < U: x(center) == x((u0+1)*stride*G),
                # i.e. the center scalar c is +-(u0+1)*stride mod n. The
                # +-(u0+1) walk outputs are invalid, so enumerate everything
                # they could have covered exactly: c itself, and the
                # doubling lane c + (u0+1)*stride = 2c (c - that is 0 = no
                # key). Lane u0 == U is the fused advance (offset
                # (2U+1)*stride): same algebra, plus the walk state is
                # invalid from that step on -> exact host rebase below.
                for s, w, u0 in zip(*np.nonzero(deg_np[:k])):
                    c = self._key_for_lane(bases[int(w)], int(s), 2 * p.block_u)
                    off = int(u0) + 1 if int(u0) < p.block_u else self.window
                    d = off * self.stride % ecref.N
                    for cand in (d, ecref.N - d, (2 * c) % ecref.N):
                        fk = self._verify(cand, 0)
                        if fk and fk.private_key not in seen:
                            seen.add(fk.private_key)
                            found.append(fk)
                rebase = bool(deg_np[:k, :, p.block_u].any())
            self.stats.add(k * p.walkers * self.window)
            step += p.steps_per_chunk
            if rng is None:
                bases = [b + p.steps_per_chunk * self.window for b in bases]
                if rebase and step < total:
                    base_pts = self._centers_for_bases(bases)
                    cx, cy = base_pts.x, base_pts.y
            if progress_every and (step // p.steps_per_chunk) % progress_every == 0:
                print(f"[brute] step {step}/{total} {self.stats.human()}")
        return found
