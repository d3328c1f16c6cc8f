"""shard_map'd brute-force search over a device mesh.

Range data-parallelism for the hash/xpoint modes (SURVEY.md §2.4 row 1
applied to thread_process, keyhunt.cpp:2511-3099): the scalar range is
statically partitioned into window-aligned slices, one per device on the
'shard' mesh axis; every device runs the SAME fused walk+hash+membership
kernel (curve/pbrute.py) on its own slice, with the target words /
bucket table / step tables replicated (read-only, like the reference's
shared bloom+table). A psum'd interest flag over ICI lets the host skip
decoding all-quiet chunks — one replicated scalar per chunk instead of
D summaries.

Per-device index algebra, summary decoding, and exact host verification
are delegated to D child BruteEngine instances (one per slice, sharing
the memoized target structures) — the mesh layer only orchestrates the
collective chunk and the pipeline.
"""

from __future__ import annotations

import math
from collections import deque
from dataclasses import replace
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..engine.brute import BruteEngine, BruteParams
from ..engine.common import Deadline, FoundKey, SearchStats
from ..utils.targets import TargetSet
from .partition import RangePartitioner


class ShardedBruteEngine:
    """Brute modes with the range sharded across all devices of a mesh.

    Children must take the fused-kernel path (params.pallas is forced to
    'on'; the XLA fallback has its own walker-level parallelism and no
    mesh story — use dist/ workers for CPU fleets instead).
    """

    def __init__(
        self,
        targets: TargetSet,
        range_start: int,
        range_end: int,
        mode: str = "rmd160",
        params: BruteParams = BruteParams(),
        devices: Optional[list] = None,
        intervals=None,
        prefixes=None,
    ):
        devs = devices if devices is not None else jax.devices()
        self.mesh = Mesh(np.array(devs), ("shard",))
        self.n_shards = d = len(devs)
        params = replace(params, pallas="on", random_mode=False)
        self.p = params
        window = params.block_u * params.stride
        self.slices = RangePartitioner.split_equal(
            range_start, range_end, d, window
        )
        # one child per slice, each an independent walk over its own
        # sub-range (split_equal never yields an empty slice; degenerate
        # shards repeat the last window and dedupe at verification)
        self.children = [
            BruteEngine(targets, sl.start, sl.end, mode=mode, params=params,
                        intervals=intervals, prefixes=prefixes)
            for sl in self.slices
        ]
        for c in self.children:
            assert c._fast
        if jax.default_backend() == "cpu":  # pragma: no cover - warning only
            from ..core.log import get_logger

            get_logger().warn(
                "sharded brute on the CPU backend interprets the fused "
                "kernel (pathologically slow) — intended for TPU meshes"
            )
        self.stats = SearchStats()
        self.stats.multiplier = self.children[0].stats.multiplier
        self.local_steps = max(c._fast_total_steps for c in self.children)
        self._sharded_chunk = self._make_sharded_chunk()

    # ------------------------------------------------------------------

    def _bases_at(self, step: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(D, 8) x2 chunk base points at local step offset `step`.

        A base at the point at infinity (child._fast_base -> None) can
        only happen when a slice boundary lands exactly on a multiple of
        the group order — impossible for ranges inside [1, n)."""
        xs, ys = [], []
        for c in self.children:
            px, py = c._fast_base(step)
            if px is None:  # pragma: no cover - see docstring
                raise ValueError("chunk base at infinity (range touches n)")
            xs.append(px)
            ys.append(py)
        sharding = jax.sharding.NamedSharding(self.mesh, P("shard"))
        return (
            jax.device_put(jnp.stack(xs), sharding),
            jax.device_put(jnp.stack(ys), sharding),
        )

    def _make_sharded_chunk(self):
        from ..curve import pbrute

        p = self.p
        c0 = self.children[0]
        K, U, SB, C = p.steps_per_chunk, p.block_u, p.pallas_sb, p.chunk_cand
        mode, ne = c0.mode, c0._n_endo_fast
        hr, nbr = p.hash_rows, c0._n_bucket_rows

        def local_chunk(px, py, tabx, taby, ax, ay, tgt, btab):
            """px/py: (1, 8) local shard base; the rest replicated args
            (P() specs) so the serialized HLO stays small."""
            nx, ny, out = pbrute.pallas_brute_chunk(
                px.reshape(8), py.reshape(8), tabx, taby, ax, ay, tgt,
                btab, K=K, U=U, SB=SB, C=C, mode=mode, n_endo=ne,
                hash_rows=hr, n_bucket_rows=nbr,
            )
            npos = (out[:C] < K * U).sum()
            ndeg = out[2 * C : 2 * C + K].sum()
            adv = out[2 * C + 2 * K : 2 * C + 3 * K].sum()
            over = (out[2 * C + 3 * K] > C).astype(jnp.int32)
            interest = jax.lax.psum(npos + ndeg + adv + over, "shard")
            return nx[None], ny[None], out[None], interest

        smapped = shard_map(
            local_chunk,
            mesh=self.mesh,
            in_specs=(P("shard"), P("shard")) + (P(),) * 6,
            out_specs=(P("shard"), P("shard"), P("shard"), P()),
            check_vma=False,
        )
        jitted = jax.jit(smapped)

        def chunk(px, py):
            return jitted(
                px, py, c0._tab_x_lm, c0._tab_y_lm, c0._adv_x_f,
                c0._adv_y_f, c0._tgt_words, c0._btab,
            )

        return chunk

    # ------------------------------------------------------------------

    def search_sharded(
        self,
        max_steps: Optional[int] = None,
        stop_on_first: bool = False,
        progress_every: int = 0,
        max_seconds: Optional[float] = None,
    ) -> List[FoundKey]:
        """Pipelined mesh search (same discipline as the BSGS mesh
        engines): dispatch pipeline_depth chunks ahead with async host
        copies; decode only chunks whose psum'd interest is nonzero."""
        p = self.p
        dl = Deadline(max_seconds)
        K = p.steps_per_chunk
        total = (
            self.local_steps if max_steps is None
            else min(self.local_steps, max_steps)
        )
        found: List[FoundKey] = []
        seen = set()

        def take(fks) -> bool:
            new = False
            for fk in fks:
                if fk and fk.private_key not in seen:
                    seen.add(fk.private_key)
                    found.append(fk)
                    new = True
            return new

        for c in self.children:
            for k0 in c._fast_prefix:
                take([c._verify(k0, 0)])
        if found and stop_on_first:
            return found

        px, py = self._bases_at(0)
        pending: deque = deque()
        disp = 0
        n_done = 0
        while pending or disp < total:
            while (
                disp < total
                and len(pending) < p.pipeline_depth
                and not dl.expired()
            ):
                px, py, outs, interest = self._sharded_chunk(px, py)
                outs.copy_to_host_async()
                interest.copy_to_host_async()
                pending.append((disp, outs, interest))
                disp += K
            if not pending:
                break  # deadline cut dispatch with nothing in flight
            step, outs, interest = pending.popleft()
            k = min(K, total - step)
            rebase = False
            if int(np.asarray(interest)) > 0:
                arr = np.asarray(outs)  # (D, summary)
                for d, c in enumerate(self.children):
                    k_eff, new_found = c._decode_fast(step, arr[d])
                    take(new_found)
                    if k_eff < k:
                        # this shard's advance chain degenerated: the
                        # remaining steps of ITS chunk walked garbage —
                        # cover them exactly on the host, then rebase
                        # every shard at the next chunk boundary
                        take(c._host_rescan_fast(step + k_eff, k - k_eff))
                        rebase = True
            for c in self.children:
                live = max(0, min(k, c._fast_total_steps - step))
                self.stats.add(live * p.block_u)
            n_done += 1
            if found and stop_on_first:
                return found
            if rebase and step + K < total:
                pending.clear()
                disp = step + K
                px, py = self._bases_at(disp)
            if progress_every and n_done % progress_every == 0:
                print(
                    f"[brute-sharded] local step {step + K}/{total} "
                    f"{self.stats.human()}"
                )
        return found
