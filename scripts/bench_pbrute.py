"""Throughput bench of the fused brute pipeline on the real TPU."""
import jax as _j
_j.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import sys
import time

import jax
import numpy as np

from keyhuntm1cpu_tpu.engine.brute import BruteEngine, BruteParams
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import TargetSet

U = int(sys.argv[sys.argv.index("-u") + 1]) if "-u" in sys.argv else 8192
K = int(sys.argv[sys.argv.index("-k") + 1]) if "-k" in sys.argv else 64
SB = int(sys.argv[sys.argv.index("-sb") + 1]) if "-sb" in sys.argv else 4
T = int(sys.argv[sys.argv.index("-t") + 1]) if "-t" in sys.argv else 32
modes = sys.argv[sys.argv.index("-m") + 1].split(",") if "-m" in sys.argv else [
    "rmd160", "xpoint", "eth", "address_u"]

print(f"U={U} K={K} SB={SB} T={T} dev={jax.devices()}")
mk = {
    "rmd160": lambda pt: hashref.pubkey_to_hash160(pt, compressed=True),
    "xpoint": lambda pt: pt[0].to_bytes(32, "big"),
    "eth": hashref.pubkey_to_eth_address,
    "address_u": lambda pt: hashref.pubkey_to_hash160(pt, compressed=False),
}
kindmap = {"rmd160": "hash160", "xpoint": "xpoint", "eth": "eth",
           "address_u": "hash160"}

for mode in modes:
    keys = list(range(100001, 100001 + T))
    raw = [mk[mode](ecref.scalar_mult(k)) for k in keys]
    ts = TargetSet(kind=kindmap[mode], raw=raw, labels=[str(k) for k in keys])
    params = BruteParams(block_u=U, steps_per_chunk=K, pallas_sb=SB,
                         pallas="on")
    eng = BruteEngine(ts, 1 << 40, (1 << 40) + (1 << 50), mode=mode,
                      params=params)
    t0 = time.time()
    eng.search(max_steps=K)  # compile + first chunk
    compile_s = time.time() - t0
    n_chunks = 8
    t0 = time.time()
    eng.search(max_steps=n_chunks * K)
    dt = time.time() - t0
    pts = n_chunks * K * U
    rate = pts / dt
    eff = rate * eng.stats.multiplier
    print(f"{mode}: {rate/1e6:.1f}M pts/s, {eff/1e6:.1f}M keys/s eff "
          f"(mult {eng.stats.multiplier}), compile+1st {compile_s:.1f}s, "
          f"{dt/n_chunks*1000:.1f} ms/chunk")
