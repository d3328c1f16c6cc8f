"""Speed-of-light analysis of the bitmap probe (VERDICT r2 item 3).

The BSGS headline is probe-rate x stride: every walked point pays ONE
random 4-byte gather into the 2^b-bit direct-address bitmap
(filter/bitmap.py probe()).  Round 2 measured ~66M gathers/s into the
4 GB table and asserted an "HBM wall" without a roofline.  This
experiment measures the chip's achievable independent-random-gather
rate across layouts and access patterns:

  elem      words[idx]                      (the production probe)
  row128    rows=words2d[idx>>7] + lane take_along_axis (512 B pulls)
  sorted    gather with PRE-SORTED indices  (locality upper bound;
            excludes the sort)
  sortfull  argsort + gather + unsort       (what a locality-bucketed
            probe would really cost)
  seq       contiguous indices              (perfect-locality bound)
  small     elem gather into a 4 MB table   (cache/VMEM-resident bound)

plus the standalone lax.sort cost at the probe batch size, so
sort-bucketing can be judged: it wins iff
  t(sortfull) < t(elem).

Timing: every iteration's indices depend on the previous output sum
(defeats CSE/overlap) and the loop result is pulled with np.asarray —
block_until_ready returns EARLY through the axon tunnel (memory:
tpu-pallas-gotchas) so a value pull is the only trustworthy fence.

Roofline: v5e HBM ~819 GB/s.  A random 4 B gather costs one HBM
transaction; at 32 B minimum transactions that is ~25.6 G gathers/s —
three orders above the measured rate — so if `elem` stays ~67M/s the
wall is GATHER-ISSUE serialization, not bandwidth, and the lever is
issuing fewer/wider gathers (row128) or restructuring the probe.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from functools import partial


def log(*a):
    print(*a, flush=True)


B = 1 << 19  # queries per step (the production U*K chunk width)
LCG_A = np.uint32(1664525)
LCG_C = np.uint32(1013904223)


def _next_idx(idx, feedback, mask):
    return (idx * LCG_A + LCG_C + feedback) & mask


@partial(jax.jit, static_argnames=("n_words", "variant", "iters"))
def run_variant(words, idx0, *, n_words: int, variant: str, iters: int):
    mask = jnp.uint32(n_words - 1)
    words2d = words.reshape(-1, 128) if variant == "row128" else None

    def body(carry, _):
        idx, fb = carry
        if variant == "seq":
            base = fb & mask
            q = (base + jnp.arange(B, dtype=jnp.uint32)) & mask
        else:
            q = _next_idx(idx, fb, mask)
        if variant in ("elem", "small", "seq"):
            got = words[q.astype(jnp.int32)]
        elif variant == "row128":
            rows = words2d[(q >> jnp.uint32(7)).astype(jnp.int32)]
            got = jnp.take_along_axis(
                rows, (q & jnp.uint32(127)).astype(jnp.int32)[:, None], axis=1
            )[:, 0]
        elif variant == "sorted":
            qs = jnp.sort(q)
            got = words[qs.astype(jnp.int32)]
        elif variant == "sortfull":
            order = jnp.argsort(q)
            got_s = words[q[order].astype(jnp.int32)]
            got = jnp.zeros_like(got_s).at[order].set(got_s)
        else:
            raise ValueError(variant)
        fb2 = got.sum(dtype=jnp.uint32)
        return (q, fb2), fb2

    (idx, fb), _ = jax.lax.scan(
        body, (idx0, jnp.uint32(1)), None, length=iters
    )
    return fb


@partial(jax.jit, static_argnames=("iters",))
def run_sort_only(idx0, *, iters: int):
    def body(carry, _):
        idx, fb = carry
        q = _next_idx(idx, fb, jnp.uint32(0xFFFFFFFF))
        qs = jnp.sort(q)
        fb2 = qs[0] + qs[-1]
        return (q, fb2), fb2

    (_, fb), _ = jax.lax.scan(body, (idx0, jnp.uint32(1)), None, length=iters)
    return fb


def measure(fn, label, n_ops, warm_iters=2, iters=20):
    t0 = time.time()
    np.asarray(fn(warm_iters))
    log(f"  [{label}] compile+warm {time.time()-t0:.1f}s")
    t0 = time.time()
    out = np.asarray(fn(iters))
    dt = time.time() - t0
    rate = iters * n_ops / dt
    log(
        f"  {label}: {rate:.3e} gathers/s"
        f"  ({dt/iters*1e3:.2f} ms per {n_ops>>10}k, sum={out & 0xFFFF})"
    )
    return rate


def main():
    log(jax.devices())
    rng = np.random.default_rng(11)
    idx0 = jnp.asarray(rng.integers(0, 2**32, size=B, dtype=np.uint32))

    results = {}
    # sort-only baseline (is bucketing even affordable?)
    r = measure(
        lambda n: run_sort_only(idx0, iters=n), "lax.sort 512k u32", B
    )
    results["sort_only"] = r

    for wlog in (20, 25, 28, 30):  # 4 MB .. 4 GB of words
        n_words = 1 << wlog
        log(f"-- table 2^{wlog} words ({4 * n_words >> 20} MB) --")
        words = jnp.asarray(
            rng.integers(0, 2**32, size=n_words, dtype=np.uint32)
        )
        variants = ["elem", "seq", "row128", "sorted", "sortfull"]
        if wlog == 20:
            variants = ["elem", "seq"]  # 'small' case: latency floor
        for v in variants:
            r = measure(
                lambda n, v=v: run_variant(
                    words, idx0, n_words=n_words, variant=v, iters=n
                ),
                f"{v} 2^{wlog}",
                B,
            )
            results[f"{v}_{wlog}"] = r
        del words

    log("== roofline ==")
    hbm = 819e9
    log(f"  HBM 819 GB/s -> {hbm/32:.2e}/s at 32 B txn, {hbm/512:.2e}/s at 512 B txn")
    elem30 = results.get("elem_30")
    if elem30:
        log(f"  elem 4 GB measured: {elem30:.3e}/s "
            f"({1e9/elem30:.1f} ns/query) -> "
            f"{'LATENCY/ISSUE bound' if elem30 < hbm/512/4 else 'approaching BW'}")
    import json

    log("JSON " + json.dumps({k: f"{v:.4e}" for k, v in results.items()}))


if __name__ == "__main__":
    main()
