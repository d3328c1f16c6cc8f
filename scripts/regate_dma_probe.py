"""Re-gate the parked DMA-pipelined probe on a (possibly new) toolchain.

filter/bitmap.py dma_gather is bit-exact in interpret mode but crashed
the Mosaic remote-compile helper on every 2026-08 libtpu variant
(gates 09/13/15) — it is excluded from PROBE_MODES until a toolchain
can compile it. This script is the one-command recheck (VERDICT r4 #9):
run it after any libtpu/jax bump; if it prints DMA PROBE OK, flip
probe_mode="dma" back into PROBE_MODES and A/B it against "elem".

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/regate_dma_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import numpy as np


def main():
    print(f"devices: {jax.devices()}", flush=True)
    try:
        import jaxlib

        print(f"jax {jax.__version__} jaxlib {jaxlib.__version__}", flush=True)
    except Exception:
        pass
    import jax.numpy as jnp

    from keyhuntm1cpu_tpu.filter import bitmap as bmp

    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, 1 << 20, dtype=np.uint32))
    idx = jnp.asarray(
        rng.integers(0, 1 << 20, 1 << 16).astype(np.int32)
    )
    try:
        out = np.asarray(bmp.dma_gather(idx, words))
    except Exception as e:
        print(f"DMA PROBE STILL BROKEN on this toolchain: {type(e).__name__}: "
              f"{str(e)[:500]}", flush=True)
        print("(keep dma out of PROBE_MODES)", flush=True)
        return 1
    ref = np.asarray(words)[np.asarray(idx)]
    if not np.array_equal(out, ref):
        print("DMA PROBE COMPILES BUT MISCOMPARES — do not enable", flush=True)
        return 2
    # quick rate probe vs elem
    t0 = time.time()
    o = None
    for _ in range(16):
        o = bmp.dma_gather(idx, words)
    np.asarray(o[:1])
    dt = (time.time() - t0) / 16
    print(f"DMA PROBE OK: {idx.shape[0]/dt:.3e} gathers/s "
          "(compare vs the 6.2e7/s elem ceiling; if faster, add 'dma' to "
          "PROBE_MODES and run scripts/exp_probe_sol.py)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
