"""Minikey validity-kernel block-rows sweep (the engine's next wall at
~45% of the chunk after the pallas ladder). Equality-gated vs BR=8,
then the full engine rate at the winner via KEYHUNT_MINIKEY_VALID_BR.

Run: python scripts/exp_valid_rows.py
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
from keyhuntm1cpu_tpu.hash import pminikey

B = 1 << 23


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    from keyhuntm1cpu_tpu.utils.targets import TargetSet

    ts = TargetSet(kind="hash160",
                   raw=[bytes(rng.integers(0, 256, 20, dtype=np.uint8))],
                   labels=["decoy"])
    eng = mk.MinikeyEngine(ts, prefix="Sbenchmark1x",
                           params=mk.tuned_params(batch=B))
    w22b, w23b = eng._base_words(eng.prefix + "11111")

    ref = None
    for br in (8, 16, 32):
        out = np.asarray(pminikey._minikey_valid_jit(
            jnp.uint32(1), w23b, B=B, alphabet=mk._B58,
            interpret=False, block_rows=br,
        ))
        if ref is None:
            ref = out
        else:
            assert np.array_equal(out, ref), f"BR={br} MISMATCH"

        def step(st, _br=br):
            lo = st[0]
            v = pminikey._minikey_valid_jit(
                lo, w23b, B=B, alphabet=mk._B58, interpret=False,
                block_rows=_br,
            )
            return (lo + v[0].astype(jnp.uint32),)

        t0 = time.time()
        s = step((jnp.uint32(1),))
        np.asarray(s[0])
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(10):
            s = step(s)
        np.asarray(s[0])
        dt = (time.time() - t0) / 10
        print(f"| valid | br={br} | {dt*1e3:.2f} ms | "
              f"{B/dt/1e6:.1f}M lanes/s | compile {comp:.0f}s |",
              flush=True)
    print("SWEEP DONE (equality-gated)", flush=True)


if __name__ == "__main__":
    main()
