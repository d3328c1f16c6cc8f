"""Multi-target BSGS T-sweep (VERDICT r4 #3 tail): chunk rate at
T in {4, 16, 64} with the headline host-resolve shapes, each behind a
planted-key gate (one key per T inside the scanned window).

Run on device: python scripts/exp_t_sweep.py [log2_m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def main():
    import dataclasses

    from keyhuntm1cpu_tpu.engine.bsgs import BSGSEngine, BSGSParams
    from keyhuntm1cpu_tpu.filter import host_table as ht
    from keyhuntm1cpu_tpu.ref import ecref

    print(f"devices: {jax.devices()}", flush=True)
    table = ht.ensure_host_table(1 << LOG2M)
    params = BSGSParams(
        m=1 << LOG2M, block_u=16384, steps_per_chunk=256,
        build_block=4096, bits_log2=35, resolve="host", cascade2="on",
    )
    # build filters ONCE; reuse across T
    base = BSGSEngine([ecref.scalar_mult(3)], 1 << 63, 1 << 64, params,
                      host_table=table)
    kw = dict(host_table=table, bitmap=base.bitmap, bloom2=base._bloom2)
    stride = base.stride

    for T in (4, 16, 64):
        gate_p = dataclasses.replace(params, steps_per_chunk=8)
        a = 1 << 63
        window = gate_p.steps_per_chunk * gate_p.block_u * stride
        rng = np.random.default_rng(T)
        planted = sorted(a + int(v) for v in
                         rng.integers(0, window, size=T))
        pubs = [ecref.scalar_mult(k) for k in planted]
        eng = BSGSEngine(pubs, a, a + window, gate_p, **kw)
        got = sorted(f.private_key for f in
                     eng.search(stop_on_first=False, max_steps=8))
        missing = [k for k in planted if k not in got]
        assert not missing, (T, missing)
        print(f"[gate] T={T}: {T} planted keys recovered bit-exact",
              flush=True)

        run_p = dataclasses.replace(params, steps_per_chunk=32)
        pubs = [ecref.scalar_mult(0x1000 + 7 * i) for i in range(T)]
        eng = BSGSEngine(pubs, 1 << 63, 1 << 64, run_p, **kw)
        b0 = eng._initial_base(0)
        px, py = b0.x, b0.y
        px, py, outs = eng._chunk_fn(px, py)
        np.asarray(outs)
        t0 = time.time()
        chunks, inflight = 0, []
        while time.time() - t0 < 10.0:
            px, py, outs = eng._chunk_fn(px, py)
            outs.copy_to_host_async()
            inflight.append(outs)
            if len(inflight) > 8:
                np.asarray(inflight.pop(0))
            chunks += 1
        for o in inflight:
            np.asarray(o)
        dt = time.time() - t0
        rate = chunks * run_p.steps_per_chunk * run_p.block_u * stride / dt
        print(f"[bench] T={T}: {rate:.3e} range-keys/s "
              f"({rate/T:.3e} per-target)", flush=True)
    print("SWEEP PASS", flush=True)


if __name__ == "__main__":
    main()
