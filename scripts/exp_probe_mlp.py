"""Attack the probe wall with memory-level parallelism (VERDICT r3 #1).

exp_probe_sol measured the XLA element gather at ~1.0e7 queries/s
LATENCY-CHAINED (each call's input depends on the previous call's
output). Run 1 of this experiment (gate 09) added the unchained number:
~5e7/s when successive probe dispatches are independent — the engine
sits between the two (1.5e7/s at m=2^28, 2.8e7/s at m=2^26) because its
probe feeds same-graph compaction. HBM headroom at 32 B transactions is
2.56e10/s either way: the gather is issue-bound, not bandwidth-bound.

This experiment raises memory-level parallelism INSIDE one kernel with
Pallas: issue MANY independent DMAs before waiting on any.

  dma1    per query: one 4 B async copy HBM->SMEM landing directly in
          the SMEM output block, all BQ in flight per grid block.
          (Run-1 lesson: a (BQ, 1) VMEM landing crashes Mosaic.)
  dma8    per query: the aligned 32 B sector HBM->VMEM (BQ, 8), lane
          selected vectorized. (Run-1 lesson: bitcast to int32 before
          the select-sum — unsigned reductions are unimplemented.)
  vmem    scalar-indexed loop over a VMEM-resident table, SMEM output.
          (Run-1 lesson: scalar stores to VMEM are rejected.)

All variants are verified bit-exact against words[idx] before timing.
Reference analog: the bloom1 check per X, keyhunt.cpp:3944-3947.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_probe_mlp.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


# ---------------------------------------------------------------------------
# dma1: per-query 4 B async copies landing in the SMEM output block
# (the production kernel: filter/bitmap.py dma_gather)
# ---------------------------------------------------------------------------

from keyhuntm1cpu_tpu.filter.bitmap import dma_gather  # noqa: E402


# ---------------------------------------------------------------------------
# dma8: per-query aligned 32 B sector copies into VMEM, lane select
# ---------------------------------------------------------------------------


def _dma8_kernel(idx_ref, idxv_ref, words_ref, out_ref, scratch, sem, *,
                 BQ: int):
    def dma(i):
        base = (idx_ref[i] // 8) * 8
        return pltpu.make_async_copy(
            words_ref.at[pl.ds(base, 8)], scratch.at[i], sem
        )

    def issue(i, carry):
        dma(i).start()
        return carry

    jax.lax.fori_loop(0, BQ, issue, 0)

    def drain(i, carry):
        dma(i).wait()
        return carry

    jax.lax.fori_loop(0, BQ, drain, 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (BQ, 8), 1)
    want = (idxv_ref[:] % 8)[:, None]
    vals = jax.lax.bitcast_convert_type(scratch[:], jnp.int32)
    picked = jnp.where(lane == want, vals, 0).sum(axis=1, dtype=jnp.int32)
    out_ref[:] = jax.lax.bitcast_convert_type(picked, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("BQ",))
def dma8_probe(word_idx, words, *, BQ: int):
    B = word_idx.shape[0]
    assert B % BQ == 0
    return pl.pallas_call(
        functools.partial(_dma8_kernel, BQ=BQ),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.uint32),
        grid=(B // BQ,),
        in_specs=[
            pl.BlockSpec((BQ,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ,), lambda g: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BQ,), lambda g: (g,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BQ, 8), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(word_idx, word_idx, words)


# ---------------------------------------------------------------------------
# vmem: scalar-loop gather from a VMEM-resident table, SMEM output
# ---------------------------------------------------------------------------


def _vmem_kernel(idx_ref, words_ref, out_ref, *, BQ: int):
    def body(i, carry):
        out_ref[i] = words_ref[idx_ref[i]]
        return carry

    jax.lax.fori_loop(0, BQ, body, 0)


@functools.partial(jax.jit, static_argnames=("BQ",))
def vmem_probe(word_idx, words, *, BQ: int):
    B = word_idx.shape[0]
    return pl.pallas_call(
        functools.partial(_vmem_kernel, BQ=BQ),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.uint32),
        grid=(B // BQ,),
        in_specs=[
            pl.BlockSpec((BQ,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ,), lambda g: (g,),
                               memory_space=pltpu.SMEM),
    )(word_idx, words)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def timed(name, fn, *args, iters=10):
    t0 = time.time()
    out = fn(*args)
    np.asarray(out[:1])
    log(f"  [{name}] compile+warm {time.time()-t0:.1f}s")
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(outs[-1][:1])  # ONE sync: per-output pulls pay the ~28 ms
    dt = (time.time() - t0) / iters  # tunnel RTT each (run-2 artifact)
    rate = args[0].shape[0] / dt
    log(f"  {name}: {rate:.3e} gathers/s  ({dt*1e3:.2f} ms per "
        f"{args[0].shape[0]//1024}k)")
    return rate


def check(name, got, want):
    got = np.asarray(got)
    if np.array_equal(got, want):
        return True
    bad = np.nonzero(got != want)[0]
    log(f"  {name}: WRONG at {bad[:5]} (got {got[bad[:3]]}, "
        f"want {want[bad[:3]]}) [{len(bad)}/{len(want)} bad]")
    return False


def main():
    log(jax.devices())
    rng = np.random.default_rng(11)
    B = 1 << 19
    results = {}

    for wlog in (25, 30):
        n_words = 1 << wlog
        words = jnp.asarray(
            rng.integers(0, 2**32, size=n_words, dtype=np.uint32)
        )
        idx = jnp.asarray(
            rng.integers(0, n_words, size=B, dtype=np.int64).astype(np.int32)
        )
        want = np.asarray(words[idx])
        log(f"-- table 2^{wlog} words ({n_words*4//(1<<20)} MB) --")

        @jax.jit
        def elem(idx, words):
            return words[idx]

        results[f"elem_{wlog}"] = timed(f"elem 2^{wlog}", elem, idx, words)

        for BQ in (256, 512, 1024):
            name = f"dma1 BQ={BQ} 2^{wlog}"
            try:
                if check(name, dma_gather(idx, words, BQ=BQ), want):
                    results[f"dma1_{BQ}_{wlog}"] = timed(
                        name,
                        lambda i, w: dma_gather(i, w, BQ=BQ), idx, words,
                    )
            except Exception as e:
                log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        for BQ in (256, 512):
            name = f"dma8 BQ={BQ} 2^{wlog}"
            try:
                if check(name, dma8_probe(idx, words, BQ=BQ), want):
                    results[f"dma8_{BQ}_{wlog}"] = timed(
                        name,
                        lambda i, w: dma8_probe(i, w, BQ=BQ), idx, words,
                    )
            except Exception as e:
                log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # Mosaic raw scalar-gather rate, VMEM-resident 4 MB table
    wlog = 20
    n_words = 1 << wlog
    words = jnp.asarray(rng.integers(0, 2**32, size=n_words, dtype=np.uint32))
    idx = jnp.asarray(
        rng.integers(0, n_words, size=B, dtype=np.int64).astype(np.int32)
    )
    want = np.asarray(words[idx])
    log(f"-- table 2^{wlog} words (4 MB, VMEM) --")
    try:
        if check("vmem 2^20", vmem_probe(idx, words, BQ=512), want):
            results["vmem_20"] = timed(
                "vmem 2^20", lambda i, w: vmem_probe(i, w, BQ=512),
                idx, words,
            )
    except Exception as e:
        log(f"  vmem 2^20: FAILED {type(e).__name__}: {str(e)[:200]}")

    log("JSON " + str({k: f"{v:.4e}" for k, v in sorted(results.items())}))


if __name__ == "__main__":
    main()
