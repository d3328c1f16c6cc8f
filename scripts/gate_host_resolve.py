"""Device gate: host-resolve BSGS (streaming filter build + pallas chunk).

Validates, on the real chip:
1. The streaming filter build (one lax.scan carrying bitmap+bloom2+walk
   state) has NO false negatives: every baby key from the host table
   probes True through both filters.
2. The full host-resolve engine recovers the puzzle-63 key bit-exact
   from a window (the bench's canonical gate, reference BSGSD.md:33-96).
3. Throughput sample at the gate m for the record.

Usage: gate_host_resolve.py [log2_m] [bench_seconds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 24
BENCH_SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
M = 1 << LOG2M
U = int(os.environ.get("GATE_U", 16384))
K = int(os.environ.get("GATE_K", 256))
PUZZLE63_KEY = 0x7CCE5EFDACCF6808


def main():
    from keyhuntm1cpu_tpu.engine.bsgs import BSGSEngine, BSGSParams
    from keyhuntm1cpu_tpu.filter import bitmap as bmp
    from keyhuntm1cpu_tpu.filter import host_table as ht
    from keyhuntm1cpu_tpu.ref import ecref

    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.time()
    table = ht.ensure_host_table(M, progress=True)
    print(f"host table m=2^{LOG2M} ready in {time.time()-t0:.1f}s", flush=True)

    pub63 = ecref.scalar_mult(PUZZLE63_KEY)
    params = BSGSParams(
        m=M, block_u=U, steps_per_chunk=K, build_block=4096,
        bits_log2=min(35, int(os.environ.get("GATE_BITS", 35))),
        resolve="host", cascade2="on",
        bloom2_bits=(int(os.environ["GATE_B2"]) if "GATE_B2" in os.environ
                     else None),
    )
    t0 = time.time()
    eng = BSGSEngine([pub63], 1 << 63, 1 << 64, params, host_table=table)
    build_s = time.time() - t0
    print(f"streaming filters built in {build_s:.1f}s "
          f"(bits={eng.bitmap.bits_log2}, b2={eng._bloom2.bits_log2})",
          flush=True)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        print(f"HBM in use: {stats.get('bytes_in_use', 0)/2**30:.2f} GiB",
              flush=True)
    except Exception as e:
        print(f"(memory_stats unavailable: {e})", flush=True)
    if os.environ.get("GATE_BUILD_TWICE"):
        t0 = time.time()
        eng_w = BSGSEngine([pub63], 1 << 63, 1 << 64, params,
                           host_table=table)
        print(f"warm streaming build: {time.time()-t0:.1f}s "
              "(same shapes, in-process jit cache -> pure run time)",
              flush=True)
        del eng_w

    # --- 1. no-false-negative sweep over sampled baby keys -------------
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    sample = rng.integers(0, M, size=1 << 20)
    skeys = np.asarray(table.keys)[sample]
    shi = (skeys >> np.uint64(32)).astype(np.uint32)
    slo = (skeys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    p1 = np.asarray(bmp.probe(eng.bitmap, jnp.asarray(shi), jnp.asarray(slo)))
    p2 = np.asarray(bmp.probe_bloom2(eng._bloom2, jnp.asarray(shi),
                                     jnp.asarray(slo)))
    assert p1.all(), f"bitmap FALSE NEGATIVES: {np.count_nonzero(~p1)}"
    assert p2.all(), f"bloom2 FALSE NEGATIVES: {np.count_nonzero(~p2)}"
    print(f"[gate] no false negatives over {len(sample)} sampled baby keys",
          flush=True)

    # --- 2. puzzle-63 bit-exact recovery --------------------------------
    stride = eng.stride
    window = U * stride
    a, b = PUZZLE63_KEY - 3 * window, PUZZLE63_KEY + 3 * window
    eng63 = BSGSEngine([pub63], a, b, params, host_table=table,
                       bitmap=eng.bitmap, bloom2=eng._bloom2)
    t0 = time.time()
    found = eng63.search()
    keys = [f.private_key for f in found]
    assert keys == [PUZZLE63_KEY], f"puzzle-63 recovery FAILED: {keys}"
    print(f"[gate] puzzle-63 recovered bit-exact in {time.time()-t0:.2f}s "
          f"over a {(b-a)/1e12:.1f}T-key window", flush=True)

    # --- 3. throughput ---------------------------------------------------
    eng64 = BSGSEngine([ecref.scalar_mult(0xF7051F27B09112D4)],
                       1 << 63, 1 << 64, params, host_table=table,
                       bitmap=eng.bitmap, bloom2=eng._bloom2)
    px, py = eng64._initial_base(0).x, eng64._initial_base(0).y
    px, py, outs = eng64._chunk_fn(px, py)
    jax.block_until_ready(outs)
    t0 = time.time()
    chunks = 0
    inflight = []
    while time.time() - t0 < BENCH_SECONDS:
        px, py, outs = eng64._chunk_fn(px, py)
        outs.copy_to_host_async()
        inflight.append(outs)
        if len(inflight) > 8:
            np.asarray(inflight.pop(0))
        chunks += 1
    for o in inflight:
        np.asarray(o)
    el = time.time() - t0
    steps = chunks * eng64.p.steps_per_chunk
    kps = steps * U * stride / el
    print(f"[gate] throughput m=2^{LOG2M}: {steps*U/el:,.0f} giant-steps/s, "
          f"{kps:.3e} keys/s (build {build_s:.1f}s)", flush=True)
    # decode cost sample: one chunk summary through _consume_summary
    arr = np.asarray(outs)
    t0 = time.time()
    eng64._consume_summary(0, eng64.p.steps_per_chunk, arr)
    print(f"[gate] summary decode: {1000*(time.time()-t0):.1f} ms/chunk "
          f"(C2={eng64._chunk_cand_eff})", flush=True)
    print("GATE PASS", flush=True)


if __name__ == "__main__":
    main()
