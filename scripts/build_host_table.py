"""Pre-build the host exact baby table cache for BSGS host-resolution.

Usage: python scripts/build_host_table.py <log2_m> [cache_dir]

Runs the native single-core builder (~3M keys/s) and writes the
baby_{m}.keys/.idx/.json cache (filter/host_table.py format). Intended
to run reniced in the background well before a bench needs the table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from keyhuntm1cpu_tpu.filter import host_table as ht


def main():
    log2_m = int(sys.argv[1])
    cache = sys.argv[2] if len(sys.argv) > 2 else ht.DEFAULT_CACHE_DIR
    m = 1 << log2_m
    existing = ht.load_host_table(m, cache)
    if existing is not None:
        print(f"cache for m=2^{log2_m} already complete", flush=True)
        return
    t0 = time.time()
    ht.build_host_table(m, cache, progress=True)
    print(f"built baby table m=2^{log2_m} in {time.time()-t0:.0f}s "
          f"-> {cache}", flush=True)


if __name__ == "__main__":
    main()
