"""Justify filter/bloom.py (VERDICT weak #6): memory + rate vs the device
structures for HUGE target sets.

The engines' device path (bitmap cascade + sorted table) assumes the
structures fit HBM next to the walk state. A 100M-entry target list at
the device sizing costs 2^(log2 T + 12) bits of HBM bitmap + 12 B/entry
of table; the host-side reference-semantics bloom (filter/bloom.py) holds
the same membership at ~2.9 B/entry (fp 1e-6) and serves dist/ workers as
the pre-filter in front of an exact host set. This prints the measured
build/check rates + memory so the tradeoff is recorded, not asserted.
"""

import time

import numpy as np

from keyhuntm1cpu_tpu.filter import bloom


def main(n=10_000_000, probes=1_000_000):
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    t0 = time.time()
    bf = bloom.BloomFilter.create(n, fp_rate=1e-6)
    bf.add(keys)
    build = time.time() - t0
    qs = rng.integers(0, 1 << 63, probes, dtype=np.uint64)
    t0 = time.time()
    miss = bf.check(qs)
    check = time.time() - t0
    fp = miss.sum() / probes
    t0 = time.time()
    present = bf.check(keys[:probes])
    check2 = time.time() - t0
    assert present.all()
    mem_bloom = bf.array.nbytes / 1e6
    mem_table = n * 12 / 1e6  # sorted hi/lo/idx planes
    mem_bitmap = (1 << (int(np.ceil(np.log2(n))) + 12)) / 8 / 1e6
    print(f"n={n:,}: bloom {mem_bloom:.0f} MB vs sorted-table {mem_table:.0f} MB"
          f" + device bitmap {mem_bitmap:.0f} MB")
    print(f"build: {n/build/1e6:.1f}M keys/s; check: {probes/check/1e6:.1f}M "
          f"probes/s (absent, fp={fp:.2e}), {probes/check2/1e6:.1f}M "
          f"probes/s (present)")


if __name__ == "__main__":
    main()
