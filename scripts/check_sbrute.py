"""On-device gate for the sharded brute mesh (parallel/brute_mesh.py).

Runs the REAL fused kernel under shard_map on the available device(s)
(D=1 on the single tunnel chip — still exercises the mesh wrapper, the
psum interest flag, and the decode fan-out) and requires bit-exact
recovery of planted keys. CPU pytest covers the orchestration with a
synthetic chunk (tests/test_parallel.py::TestShardedBrute).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from keyhuntm1cpu_tpu.engine.brute import BruteParams
from keyhuntm1cpu_tpu.parallel.brute_mesh import ShardedBruteEngine
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import TargetSet

print("devices:", jax.devices())
keys = list(range(1, 33)) + [1000, 4000]
raw = [hashref.pubkey_to_hash160(ecref.scalar_mult(k), True) for k in keys]
ts = TargetSet(kind="hash160", raw=raw, labels=[f"k{k}" for k in keys])
params = BruteParams(block_u=256, steps_per_chunk=4, pallas_sb=4,
                     chunk_cand=64)
eng = ShardedBruteEngine(ts, 1, 4097, mode="rmd160", params=params)
found = eng.search_sharded(stop_on_first=False)
got = sorted(f.private_key for f in found)
missing = [k for k in keys if k not in got]
print(f"sharded brute D={eng.n_shards}: found {len(got)}/{len(keys)} "
      f"missing={missing}")
assert not missing, missing
print("SHARDED BRUTE OK")
