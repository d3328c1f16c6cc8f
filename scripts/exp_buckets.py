"""A/B the lane-bucketed membership cost on TPU: keys/s vs target count.

The SMEM interval compare is O(T) per point (unrolled); the bucketed
path is O(T/128) gathers per point. This measures rmd160 keys/s at
production shapes for T across both regimes so the crossover and the
large-T cost curve are known numbers, each behind a bit-exact gate.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_buckets.py
     [T values...]   (default: 32 512 2048 8192 32768)
"""
import hashlib
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from keyhuntm1cpu_tpu.engine.brute import BruteEngine, BruteParams
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import TargetSet

TS = [int(t) for t in sys.argv[1:]] or [32, 512, 2048, 8192, 32768]
U = int(os.environ.get("EXP_U", 16384))
K = int(os.environ.get("EXP_K", 256))
SECONDS = float(os.environ.get("EXP_SECONDS", 6.0))


def targets_of(t: int) -> TargetSet:
    keys = [5, 1000]
    raw = [hashref.pubkey_to_hash160(ecref.scalar_mult(k), True)
           for k in keys]
    decoys = [hashlib.sha256(f"bkt{i}".encode()).digest()[:20]
              for i in range(t - len(keys))]
    return TargetSet(kind="hash160", raw=raw + decoys,
                     labels=[str(k) for k in keys]
                     + [f"d{i}" for i in range(len(decoys))])


print("devices:", jax.devices())
for t in TS:
    ts = targets_of(t)
    # correctness gate at small shapes
    gate = BruteParams(block_u=1024, steps_per_chunk=4, pallas_sb=4,
                       pallas="on", chunk_cand=64)
    eng = BruteEngine(ts, 1, 1024 * 4 + 2, mode="rmd160", params=gate)
    got = sorted(f.private_key for f in eng.search(stop_on_first=False))
    assert 5 in got and 1000 in got, (t, got)
    # rate at production shapes
    params = BruteParams(block_u=U, steps_per_chunk=K, pallas_sb=4,
                         pallas="on")
    eng = BruteEngine(ts, 1 << 40, (1 << 40) + (1 << 50), mode="rmd160",
                      params=params)
    path = "bucketed" if eng._bucketed else "smem"
    rows = eng._n_bucket_rows if eng._bucketed else 0
    eng.search(max_steps=K)  # compile + warm
    n = max(1, int(SECONDS / 0.12))
    k0 = eng.stats.keys_covered
    t0 = time.time()
    eng.search(max_steps=n * K, max_seconds=3 * SECONDS)
    dt = time.time() - t0
    eff = (eng.stats.keys_covered - k0) * eng.stats.multiplier / dt
    print(f"T={t:>6} path={path:8} rows={rows:>4} "
          f"{eff/1e6:9.1f}M keys/s eff ({dt:.1f}s)")
