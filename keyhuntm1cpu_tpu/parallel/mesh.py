"""shard_map'd BSGS search over a device mesh.

Data-parallel range sharding (SURVEY.md §2.4 row 1): the scalar range is
statically partitioned into window-aligned slices, one per device on the
'shard' mesh axis. Baby/stride tables are replicated (they are read-only,
like the reference's shared bloom+bPtable, keyhunt.cpp:1216-1304); every
device walks its own giant-step chain; per-chunk hit counts are psum'd
over ICI so the host driver reads ONE replicated scalar to decide whether
to decode the per-device summaries.

Scales to multi-host the same way: under jax.distributed each process
holds its devices' shards of the same global arrays; nothing here is
host-count-specific.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..curve import points, walk
from ..engine.bsgs import BSGSEngine, BSGSParams, _ImmediateHit
from ..engine.common import FoundKey
from ..filter import bitmap as bmp
from ..filter import sorted_table as st
from .partition import RangePartitioner, RangeSlice


class ShardedBSGSEngine(BSGSEngine):
    """BSGS with the range sharded across all devices of a mesh."""

    def __init__(
        self,
        pubkeys: Sequence[Tuple[int, int]],
        range_start: int,
        range_end: int,
        params: BSGSParams = BSGSParams(),
        table: Optional[st.SortedXTable] = None,
        devices: Optional[list] = None,
    ):
        super().__init__(pubkeys, range_start, range_end, params, table=table)
        devs = devices if devices is not None else jax.devices()
        self.mesh = Mesh(np.array(devs), ("shard",))
        self.n_shards = len(devs)
        window = params.block_u * self.stride
        self.slices: List[RangeSlice] = RangePartitioner.split_equal(
            range_start, range_end, self.n_shards, window
        )
        self.local_steps = max(
            1, math.ceil(max(1, math.ceil((range_end - range_start) / window)) / self.n_shards)
        )
        self._sharded_chunk = self._make_sharded_chunk()

    def _initial_bases_sharded(self, step: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(D, T, 8) x2 P_base per shard at local step offset `step`."""
        xs, ys = [], []
        for sl in self.slices:
            base = self._initial_base(sl.step0 + step)
            xs.append(base.x)
            ys.append(base.y)
        px = jnp.stack(xs)  # (D, T, 8)
        py = jnp.stack(ys)
        sharding = jax.sharding.NamedSharding(self.mesh, P("shard"))
        return jax.device_put(px, sharding), jax.device_put(py, sharding)

    def _make_sharded_chunk(self):
        T = len(self.targets)
        U = self.p.block_u
        K = self.p.steps_per_chunk
        chain = self.p.chain_len
        C = self.p.cand_max
        bits_log2 = self.bitmap.bits_log2

        def local_chunk(px, py, tab_x, tab_y, adv_x, adv_y, words, thi, tlo, tidx):
            """px/py: (1, T, 8) local shard state; tables/bitmap are
            replicated args (P() specs) — closures would embed them in the
            serialized HLO (remote compile rejects a 512 MB payload)."""
            bitmap = bmp.DeviceBitmap(words, bits_log2)
            table = st.SortedXTable(thi, tlo, tidx)
            px = px.reshape(T, 8)
            py = py.reshape(T, 8)

            def body(carry, _):
                cx, cy = carry
                pb = points.PointBatch(cx, cy, jnp.zeros((T,), dtype=bool))
                res = walk.walk_fused(pb, tab_x, tab_y, adv_x, adv_y, chain_len=chain)
                qhi, qlo = st.trunc64_from_limbs(res.x_plus)
                fl = bmp.filtered_lookup(
                    bitmap, table, qhi.reshape(-1), qlo.reshape(-1), C
                )
                deg_flat = res.degenerate.reshape(-1)
                pos_safe = jnp.minimum(fl.pos, T * U - 1)
                live = ~deg_flat[pos_safe]
                cand_pos = jnp.where(
                    (fl.result.found | fl.result.found2) & live, fl.pos, T * U
                )
                cand_j = jnp.where(fl.result.found & live, fl.result.idx, 0)
                cand_j2 = jnp.where(fl.result.found2 & live, fl.result.idx2, 0)
                deg = res.degenerate.at[:, U - 1].set(
                    res.degenerate[:, U - 1] | res.adv_degenerate
                )
                n_deg = deg.sum(axis=1).astype(jnp.int32)
                first_deg = jnp.argmax(deg, axis=1).astype(jnp.int32)
                degsum = jnp.stack(
                    [n_deg, first_deg, res.adv_degenerate.astype(jnp.int32)]
                )
                out = jnp.concatenate(
                    [
                        cand_pos.astype(jnp.int32),
                        cand_j.astype(jnp.int32),
                        cand_j2.astype(jnp.int32),
                        degsum.reshape(-1),
                        fl.n_candidates[None],
                    ]
                )  # (3C + 3T + 1,)
                return (res.adv_x, res.adv_y), out

            (px, py), outs = jax.lax.scan(body, (px, py), None, length=K)
            # outs: (K, 3C+3T+1); replicated interest flag over ICI
            cand_pos = outs[:, :C]
            degsum_n = outs[:, 3 * C : 3 * C + T]
            ncand = outs[:, 3 * C + 3 * T]
            local_interest = (
                (cand_pos < T * U).sum() + degsum_n.sum() + (ncand > C).sum()
            )
            total_interest = jax.lax.psum(local_interest, "shard")
            return px[None], py[None], outs[None], total_interest

        smapped = shard_map(
            local_chunk,
            mesh=self.mesh,
            in_specs=(P("shard"), P("shard")) + (P(),) * 8,
            out_specs=(
                P("shard"),
                P("shard"),
                P("shard"),
                P(),
            ),
            check_vma=False,
        )
        jitted = jax.jit(smapped)

        def chunk(px, py):
            return jitted(
                px, py, self.tab_x, self.tab_y, self.adv_x, self.adv_y,
                self.bitmap.words, self.table.hi, self.table.lo, self.table.idx,
            )

        return chunk

    def search_sharded(
        self,
        max_steps: Optional[int] = None,
        stop_on_first: bool = True,
        progress_every: int = 0,
    ) -> List[FoundKey]:
        p = self.p
        try:
            px, py = self._initial_bases_sharded()
        except _ImmediateHit as hit:
            return self._try_candidates([hit.scalar])
        total = self.local_steps if max_steps is None else min(self.local_steps, max_steps)
        found: List[FoundKey] = []
        step = 0
        while step < total:
            k = min(p.steps_per_chunk, total - step)
            px, py, outs, interest = self._sharded_chunk(px, py)
            rebase = False
            if int(interest) > 0:
                arr = np.asarray(outs)  # (D, K, 3C+3T+1), one transfer
                for d, sl in enumerate(self.slices):
                    parts = self._split_summary(arr[d])
                    found += self._decode_chunk(sl.step0 + step, k, *parts)
                    rebase = rebase or bool(parts[3][:k, 2].any())
                found = self._dedupe(found)
                if found and stop_on_first:
                    self.stats.add(k * self.n_shards * p.block_u * self.stride)
                    return found
            self.stats.add(k * self.n_shards * p.block_u * self.stride)
            step += p.steps_per_chunk
            if rebase and step < total:
                # some shard's advance degenerated: rebase all shards exactly
                try:
                    px, py = self._initial_bases_sharded(step)
                except _ImmediateHit as hit:
                    found += self._try_candidates([hit.scalar])
                    if found and stop_on_first:
                        return self._dedupe(found)
                    break
            if progress_every and (step // p.steps_per_chunk) % progress_every == 0:
                print(f"[bsgs-sharded] local step {step}/{total} {self.stats.human()}")
        return found

    @staticmethod
    def _dedupe(found: List[FoundKey]) -> List[FoundKey]:
        seen = {}
        for f in found:
            seen[(f.private_key, f.target)] = f
        return list(seen.values())
