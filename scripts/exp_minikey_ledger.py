"""Minikey per-phase ledger (VERDICT r4 #4): decompose the chunk before
attacking the wall.

Phases timed on device (dependent-chained, value-pull fenced):
  valid    — Pallas validity kernel at B
  compact  — valid-lane compaction alone at B (old flat nonzero vs
             filter.bitmap.compact_positions)
  finish   — the whole _minikey_finish_impl at B (compact + key sha256 +
             ladder + hash160 x2 + lookups + hit compaction)
  engine   — full MinikeyEngine.search() rate (keys/s)

Usage: exp_minikey_ledger.py [log2_batch ...]   (default 22 23)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from keyhuntm1cpu_tpu.engine import minikeys as mk
from keyhuntm1cpu_tpu.filter.bitmap import (compact_positions,
                                            compact_positions_dense)
from keyhuntm1cpu_tpu.hash import pminikey
from keyhuntm1cpu_tpu.utils.targets import TargetSet
from keyhuntm1cpu_tpu.ref import hashref, ecref

BATCHES = [int(a) for a in sys.argv[1:]] or [22, 23]


def chain_time(name, step, state, iters=8):
    t0 = time.time()
    st = step(state)
    np.asarray(jax.tree_util.tree_leaves(st)[0].ravel()[0])
    print(f"  [{name}] compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        st = step(st)
    np.asarray(jax.tree_util.tree_leaves(st)[0].ravel()[0])
    dt = (time.time() - t0) / iters
    print(f"  [{name}] {dt*1e3:.2f} ms/call", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # a target that never hits (random hash160)
    ts = TargetSet(kind="hash160", raw=[bytes(rng.integers(0, 256, 20,
                                                           dtype=np.uint8))],
                   labels=["decoy"])
    for lb in BATCHES:
        B = 1 << lb
        V = mk.valid_budget(B)
        print(f"=== batch 2^{lb} (V={V}) ===", flush=True)
        eng = mk.MinikeyEngine(ts, prefix="Sbenchmark1x",
                               params=mk.tuned_params(batch=B))
        w22b, w23b = eng._base_words(eng.prefix + "11111")

        # -- valid kernel
        def step_valid(st):
            lo = st[0]
            v = pminikey.minikey_valid(lo, w23b, B=B, alphabet=mk._B58)
            return (lo + v[0].astype(jnp.uint32),)

        t_valid = chain_time("valid", jax.jit(step_valid),
                             (jnp.uint32(1),))

        # -- compaction alone (realistic 1/256 density)
        mask0 = jnp.asarray(rng.random(B) < 1 / 256)

        @jax.jit
        def step_compact(st):
            m = st[0]
            pos = compact_positions(m, V, B)
            return (m ^ (pos[0] < 0),)

        t_comp = chain_time("compact(new)", step_compact, (mask0,))

        @jax.jit
        def step_dense(st):
            m = st[0]
            pos, lost = compact_positions_dense(m, V, B)
            return (m ^ (pos[0] < 0) ^ lost,)

        t_dense = chain_time("compact(dense)", step_dense, (mask0,))

        @jax.jit
        def step_flat(st):
            m = st[0]
            (pos,) = jnp.nonzero(m, size=V, fill_value=B)
            return (m ^ (pos[0] < 0),)

        t_flat = chain_time("compact(flat-old)", step_flat, (mask0,))

        # -- full finish impl
        valid0 = mask0

        def step_finish(st):
            lo = st[0]
            out = mk._minikey_finish_impl(
                lo, valid0, w22b, eng._gx, eng._gy,
                eng.table.hi, eng.table.lo, eng.table.idx,
                B=B, V=V, HM=eng.p.hit_max, chain=eng.p.chain_len,
                alphabet=mk._B58, tile_hash=True,
            )
            return (lo + out[0].astype(jnp.uint32),)

        t_fin = chain_time("finish", step_finish, (jnp.uint32(1),))

        # -- finish sub-phases, each dependency-chained standalone:
        # which of ladder / hashes / lookups owns the non-compact time?
        from keyhuntm1cpu_tpu.curve import points
        from keyhuntm1cpu_tpu.hash import phash
        from keyhuntm1cpu_tpu.hash.sha256 import sha256_block_words
        from keyhuntm1cpu_tpu.filter import sorted_table as st
        from keyhuntm1cpu_tpu.engine.minikeys import _mk_words, _suffix_or_words

        kv0 = jnp.asarray(
            rng.integers(0, 2**32, (V, 8), dtype=np.uint32))

        @jax.jit
        def step_sha(st_):
            vv = st_[0]
            w4or, w5or = _suffix_or_words(vv, mk._B58)
            kw = sha256_block_words(_mk_words(w22b, w4or, w5or, V))
            return (vv + kw[0].astype(jnp.uint32),)

        chain_time("fin:keysha", step_sha,
                   (jnp.arange(V, dtype=jnp.uint32),))

        @jax.jit
        def step_ladder(st_):
            kv = st_[0]
            pub, irr = points.scalar_mult_batch_jac(
                kv, eng._gx, eng._gy, chain_len=eng.p.chain_len)
            return (kv ^ pub.x[..., :1].astype(jnp.uint32),)

        chain_time("fin:ladder", step_ladder, (kv0,))

        @jax.jit
        def step_pladder(st_):
            from keyhuntm1cpu_tpu.curve import pladder

            kv = st_[0]
            pub, irr = pladder.scalar_mult_tiles(kv, eng._gx, eng._gy)
            return (kv ^ pub.x[..., :1].astype(jnp.uint32),)

        chain_time("fin:pladder", step_pladder, (kv0,))

        xb0 = jnp.asarray(rng.integers(0, 2**32, (V, 8), dtype=np.uint32))
        yb0 = jnp.asarray(rng.integers(0, 2**32, (V, 8), dtype=np.uint32))

        @jax.jit
        def step_hashes(st_):
            xb, yb = st_
            (cle, che), (clo, cho) = phash.hash160_x2_from_batch(xb)
            wu = phash.hash160_u_from_batch(xb, yb)
            d = (cle ^ clo ^ wu[0]).astype(jnp.uint32)
            return (xb ^ d[:, None], yb ^ (che ^ cho).astype(
                jnp.uint32)[:, None])

        chain_time("fin:hash160s", step_hashes, (xb0, yb0))

        q0 = jnp.asarray(rng.integers(0, 2**32, (2, V), dtype=np.uint32))

        @jax.jit
        def step_lookup(st_):
            q = st_[0]
            tbl = st.SortedXTable(eng.table.hi, eng.table.lo, eng.table.idx)
            r1 = st.lookup(tbl, q[0], q[1])
            r2 = st.lookup(tbl, q[1], q[0])
            d = (r1.found ^ r2.found).astype(jnp.uint32)
            return (q ^ d[None, :],)

        chain_time("fin:lookup_x2", step_lookup, (q0,))

        # -- full engine rate
        eng2 = mk.MinikeyEngine(ts, prefix="Sbenchmark1x",
                                params=mk.tuned_params(batch=B))
        eng2.search(max_chunks=2)  # warm
        n = max(4, int(10.0 / max(t_valid + t_fin, 1e-3)))
        t0 = time.time()
        eng2.search(max_chunks=n)
        el = time.time() - t0
        rate = n * B / el
        print(f"  [engine] {rate/1e6:.1f}M minikeys/s "
              f"({n} chunks in {el:.1f}s)", flush=True)
        print(f"  ledger: valid {t_valid*1e3:.1f} + finish {t_fin*1e3:.1f} "
              f"(compact new {t_comp*1e3:.1f} / dense {t_dense*1e3:.1f} / old flat {t_flat*1e3:.1f}) ms",
              flush=True)


if __name__ == "__main__":
    main()
