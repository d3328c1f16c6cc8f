"""Standalone hash-kernel block-rows sweep (VERDICT r4 #5 diagnosis).

Hypothesis (docs/PERF.md): at 8-row blocks each live hash word is ONE
vreg, so the strictly serial sha/ripemd/keccak round chains bound issue
ILP (~23-34%% VPU); 16/32-row blocks give 2/4 independent vregs per op
(more issue parallelism) until the live set spills (~64 physical vregs:
sha+ripemd ~28 live words -> 16 rows should fit, keccak ~110 -> 8 only).

Sweeps hash160_x2 / keccak_eth / hash160_u at block_rows in {8,16,32},
bit-exactness checked against block_rows=8 first.
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

from keyhuntm1cpu_tpu.hash import phash

B = 1 << 20
ROWS = B // 128
ITERS = 12


def chain(step, st, n=ITERS):
    t0 = time.time()
    st2 = step(st)
    np.asarray(jax.tree_util.tree_leaves(st2)[0].ravel()[0])
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        st2 = step(st2)
    np.asarray(jax.tree_util.tree_leaves(st2)[0].ravel()[0])
    return (time.time() - t0) / n, comp


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, (8, ROWS, 128), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 2**32, (8, ROWS, 128), dtype=np.uint32))

    only = set(sys.argv[1:])  # optional kernel-name filter
    # time each kernel via a dependency on one output element
    for name, fn in (
        ("hash160_x2", lambda st, br: phash.hash160_x2_tiles(
            st, block_rows=br)[0]),
        ("keccak_eth", lambda st, br: phash.keccak_eth_tiles(
            st, y, block_rows=br)[0]),
        ("hash160_u", lambda st, br: phash.hash160_u_tiles(
            st, y, block_rows=br)[0]),
    ):
        if only and name not in only:
            continue
        ref = None
        for br in (8, 16, 32):
            out0 = np.asarray(fn(x, br))
            if ref is None:
                ref = out0
            else:
                assert np.array_equal(out0, ref), f"{name} br={br} MISMATCH"

            def step(st, _br=br):
                o = fn(st, _br)  # (ROWS, 128)
                # chain: fold one output word back into the input tile
                return st ^ (o[:1, :1].astype(jnp.uint32) & 1)

            dt, comp = chain(step, x)
            print(f"| {name} | br={br} | {dt*1e3:.2f} ms | "
                  f"{B/dt/1e6:.1f}M lanes/s | compile {comp:.0f}s |",
                  flush=True)
    print("SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
