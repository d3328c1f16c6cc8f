"""A/B the fused brute kernel's emit sub-blocking (hash_rows) on TPU.

Round-2 finding: eth runs ~2.4x slower than rmd160's hash160x2 despite
only ~1.2x the op count — suspected vreg-spill-bound (keccak keeps ~50
64-bit lanes live; on (128, 128) tiles that is ~800 vregs). hash_rows
processes the emit phase in (8, HR, 128) sub-blocks to bound the live
set. This script measures keys/s per (mode, HR) with the standard
pipelined dispatch loop and checks bit-exact recovery first.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_hash_rows.py
     [modes...]  (default: eth rmd160)
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

from keyhuntm1cpu_tpu.engine.brute import BruteEngine, BruteParams
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import TargetSet

MODES = sys.argv[1:] or ["eth", "rmd160"]
U = int(os.environ.get("EXP_U", 16384))
K = int(os.environ.get("EXP_K", 256))
HRS = [int(h) if h != "None" else None for h in
       os.environ.get("EXP_HRS", "None,8,16,32").split(",")]
MK = {
    "rmd160": lambda pt: hashref.pubkey_to_hash160(pt, compressed=True),
    "eth": hashref.pubkey_to_eth_address,
    "address_u": lambda pt: hashref.pubkey_to_hash160(pt, compressed=False),
    "xpoint": lambda pt: pt[0].to_bytes(32, "big"),
}
KIND = {"rmd160": "hash160", "eth": "eth", "address_u": "hash160",
        "xpoint": "xpoint"}


def engine(mode, hr, a, b):
    keys = [5, 1000]
    raw = [MK[mode](ecref.scalar_mult(k)) for k in keys]
    ts = TargetSet(kind=KIND[mode], raw=raw,
                   labels=[str(k) for k in keys])
    # pallas_sb=4 matches bench_modes.py so the hr=None row reproduces
    # the round-2 baseline numbers
    params = BruteParams(block_u=U, steps_per_chunk=K, pallas_sb=4,
                         pallas="on", hash_rows=hr)
    return BruteEngine(ts, a, b, mode=mode, params=params)


for mode in MODES:
    for hr in HRS:
        if hr is not None and (U // 128) % hr:
            continue
        # correctness gate: tiny range containing the planted keys
        eng = engine(mode, hr, 1, U * K + 2)
        t0 = time.time()
        found = sorted(f.private_key for f in eng.search(stop_on_first=False,
                                                         max_steps=K))
        ok = set(found) >= {5, 1000}
        compile_s = time.time() - t0
        if not ok:
            print(f"{mode} hr={hr}: GATE FAILED found={found}")
            continue
        # timed run: big disjoint range, N warm chunks
        eng = engine(mode, hr, 1 << 50, (1 << 50) + 40 * U * K)
        eng.search(max_steps=K)  # warm
        t0 = time.time()
        eng.search(max_steps=16 * K)
        dt = time.time() - t0
        rate = 16 * K * U / dt
        print(f"{mode} hr={hr}: gate ok ({compile_s:.0f}s), "
              f"{rate/1e6:.1f}M pts/s raw "
              f"({rate*eng.stats.multiplier/1e6:.1f}M keys/s eff)",
              flush=True)
