"""Device gate: the Pallas scalar-mult ladder (curve/pladder.py).

1. Bit-exact k*G vs ecref for edge + random scalars (incl. 0, N-1,
   2^256-1 raw sha-like values) through the REAL Mosaic lowering.
   (No CPU twin exists: XLA:CPU takes 2m50s to compile ONE fe_tiles
   mixed add and >25 min for the 32-window ladder — the per-window
   MXU gather is CPU-tested in tests/test_hash.py instead.)
2. Ladder rate A/B vs the XLA ladder at the minikey engine's V.
3. Minikey engine end-to-end with tile_ladder on: planted key
   recovered bit-exact, engine rate sample.
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


def main():
    from keyhuntm1cpu_tpu.curve import pladder, points, tables
    from keyhuntm1cpu_tpu.field import fe
    from keyhuntm1cpu_tpu.ref import ecref

    print(f"devices: {jax.devices()}", flush=True)
    gx, gy = tables.gtable_np()
    gxj, gyj = jnp.asarray(gx), jnp.asarray(gy)
    rng = np.random.default_rng(7)

    # --- 1. bit-exactness ------------------------------------------------
    ks = [0, 1, 2, 3, 0xABC123, ecref.N - 1, ecref.N, ecref.N + 5,
          (1 << 256) - 1, ecref.LAMBDA, (1 << 255)]
    ks += [int.from_bytes(rng.bytes(32), "big") for _ in range(200)]
    kv = np.stack([
        np.asarray(fe.int_to_limbs(k % (1 << 256)), dtype=np.uint32)
        for k in ks
    ])
    pad = (-len(ks)) % 1024
    kvj = jnp.asarray(np.vstack([kv, np.ones((pad, 8), np.uint32)]))
    t0 = time.time()
    pts, irr = pladder.scalar_mult_tiles(kvj, gxj, gyj)
    x = np.asarray(pts.x)
    print(f"pladder compile+run {time.time()-t0:.1f}s", flush=True)
    y, inf, irr = np.asarray(pts.y), np.asarray(pts.inf), np.asarray(irr)
    n_irr = 0
    for i, k in enumerate(ks):
        kk = k % ecref.N
        if kk == 0:
            # k=0: all windows infinite -> inf. k=N (etc.): the sum
            # CANCELS at some window (P + -P), which the ladder cannot
            # represent — it flags the lane irregular for host verify
            # (same contract as the XLA ladder). Both are correct.
            assert inf[i] or irr[i], f"k={k}: expected inf or flagged"
            if k == 0:
                assert inf[i], "k=0 must be infinity (all-zero windows)"
            continue
        if irr[i]:
            n_irr += 1  # contract: flagged lanes go to host verify
            continue
        ex, ey = ecref.scalar_mult(kk)
        got = (fe.limbs_to_int(x[i]), fe.limbs_to_int(y[i]))
        assert got == (ex, ey), f"k={hex(k)} MISMATCH"
    assert n_irr == 0, f"{n_irr} unexpected irregular lanes"
    print(f"bit-exact vs ecref for {len(ks)} scalars "
          "(0, N-1, N, 2^256-1, lambda, 200 random)", flush=True)

    # --- 2. ladder rate A/B ---------------------------------------------
    V = 34816
    kv0 = jnp.asarray(rng.integers(0, 2**32, (V, 8), dtype=np.uint32))

    def chain(name, step, st):
        t0 = time.time()
        s = step(st)
        np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
        print(f"  [{name}] compile {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(8):
            s = step(s)
        np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
        dt = (time.time() - t0) / 8
        print(f"  [{name}] {dt*1e3:.2f} ms/call "
              f"({V/dt/1e3:.0f}K ladders/s)", flush=True)
        return dt

    @jax.jit
    def step_xla(st):
        kv = st[0]
        pub, _ = points.scalar_mult_batch_jac(kv, gxj, gyj, chain_len=1024)
        return (kv ^ pub.x[..., :1].astype(jnp.uint32),)

    @jax.jit
    def step_pallas(st):
        kv = st[0]
        pub, _ = pladder.scalar_mult_tiles(kv, gxj, gyj)
        return (kv ^ pub.x[..., :1].astype(jnp.uint32),)

    t_x = chain("xla ladder", step_xla, (kv0,))
    t_p = chain("pallas ladder", step_pallas, (kv0,))
    print(f"speedup: {t_x/t_p:.2f}x at V={V}", flush=True)

    # --- 3. minikey engine end-to-end -------------------------------------
    from keyhuntm1cpu_tpu.engine import minikeys as mk
    from keyhuntm1cpu_tpu.ref import hashref
    from keyhuntm1cpu_tpu.utils.targets import targets_from_ints

    prefix = "Sbenchmark1x"
    mini = None
    for c in range(1 << 18):
        s = (prefix + mk._b58_digits(c // mk.LOW_SPAN, 5)
             + mk._b58_digits(c % mk.LOW_SPAN, 5))
        if hashref.sha256((s + "?").encode())[0] == 0:
            mini = s
            break
    k = int.from_bytes(hashref.sha256(mini.encode()), "big")
    ts = targets_from_ints(
        "hash160",
        [hashref.pubkey_to_hash160(ecref.scalar_mult(k), compressed=False)],
    )
    eng = mk.MinikeyEngine(ts, prefix=prefix, params=mk.tuned_params())
    found = eng.search(max_chunks=1)
    assert found and found[0].private_key == k, "minikey gate FAILED"
    print(f"[gate] minikey {mini} recovered bit-exact (tile_ladder on)",
          flush=True)
    eng.counter = 1 << 31
    n = 120
    k0 = eng.stats.keys_covered
    t0 = time.time()
    eng.search(max_chunks=n, stop_on_first=False, max_seconds=30)
    rate = (eng.stats.keys_covered - k0) / (time.time() - t0)
    print(f"[engine] {rate/1e6:.1f}M minikeys/s (pladder)", flush=True)
    print("GATE PASS", flush=True)


if __name__ == "__main__":
    main()
