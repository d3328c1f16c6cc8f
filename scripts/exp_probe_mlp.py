"""Attack the probe wall with memory-level parallelism (VERDICT r3 #1).

exp_probe_sol measured the XLA element gather at ~1.0e7 queries/s into
any table >= 128 MB — and, crucially, ~1.16e7/s even into a 4 MB table
that fits VMEM. The wall is therefore the gather ISSUE rate (XLA lowers
a random gather to a serial per-element loop, ~94 scalar cycles each),
not HBM latency. HBM headroom at 32 B transactions is 2.56e10/s.

This experiment raises memory-level parallelism with Pallas kernels that
issue MANY independent DMAs before waiting:

  dma1    per query: one 4 B async copy HBM->VMEM, all BQ in flight per
          grid block, then one bulk wait. Issue cost = a scalar loop
          iteration + a DMA descriptor, not XLA's ~94-cycle gather step.
  dma8    same, but each copy fetches the aligned 32 B sector (8 words)
          — tests whether sub-32 B descriptors are penalized.
  vmem    scalar-indexed loop over a VMEM-resident table inside the
          kernel (no DMA): measures Mosaic's raw scalar-gather rate for
          comparison with XLA's lowering.

All variants return the gathered word per query and are verified against
words[idx] before timing. Reference analog: the bloom1 check per X,
/root/reference/keyhunt.cpp:3944-3947.

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
# dma1 / dma8: per-query async copies, bulk-waited per grid block
# ---------------------------------------------------------------------------


def _dma_probe_kernel(idx_ref, idxv_ref, words_ref, out_ref, scratch, sem, *,
                      BQ: int, sector: int):
    """idx_ref: (BQ,) int32 word indices in SMEM (scalar DMA addressing);
    idxv_ref: same values in VMEM (vector lane select); words_ref: full
    bitmap in ANY/HBM; out: (BQ,) uint32 gathered words via VMEM scratch.

    Issue all BQ copies first (maximum MLP), then wait them all. With
    sector == 1 the copy is 4 B at the exact word; with sector == 8 it
    is the aligned 32 B sector and the lane is selected vectorized."""

    def dma(i):
        w = idx_ref[i]
        if sector == 1:
            return pltpu.make_async_copy(
                words_ref.at[pl.ds(w, 1)], scratch.at[i, pl.ds(0, 1)], sem
            )
        base = (w // sector) * sector
        return pltpu.make_async_copy(
            words_ref.at[pl.ds(base, sector)], scratch.at[i], sem
        )

    def issue(i, carry):
        dma(i).start()
        return carry

    jax.lax.fori_loop(0, BQ, issue, 0)

    def drain(i, carry):
        dma(i).wait()
        return carry

    jax.lax.fori_loop(0, BQ, drain, 0)

    if sector == 1:
        out_ref[:] = scratch[:, 0]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (BQ, sector), 1)
        want = (idxv_ref[:] % sector)[:, None]
        out_ref[:] = jnp.where(lane == want, scratch[:], 0).sum(
            axis=1, dtype=jnp.uint32
        )


@functools.partial(jax.jit, static_argnames=("BQ", "sector"))
def dma_probe(word_idx, words, *, BQ: int, sector: int):
    B = word_idx.shape[0]
    assert B % BQ == 0
    grid = (B // BQ,)
    return pl.pallas_call(
        functools.partial(_dma_probe_kernel, BQ=BQ, sector=sector),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BQ,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ,), lambda g: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BQ,), lambda g: (g,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BQ, sector), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(word_idx, word_idx, words)


# ---------------------------------------------------------------------------
# vmem: scalar-loop gather from a VMEM-resident table (no DMA)
# ---------------------------------------------------------------------------


def _vmem_probe_kernel(idx_ref, words_ref, out_ref, *, BQ: int):
    def body(i, carry):
        out_ref[i] = words_ref[idx_ref[i]]
        return carry

    jax.lax.fori_loop(0, BQ, body, 0)


@functools.partial(jax.jit, static_argnames=("BQ",))
def vmem_probe(word_idx, words, *, BQ: int):
    B = word_idx.shape[0]
    grid = (B // BQ,)
    return pl.pallas_call(
        functools.partial(_vmem_probe_kernel, BQ=BQ),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BQ,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ,), lambda g: (g,),
                               memory_space=pltpu.VMEM),
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
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    np.asarray(acc[:1])
    dt = (time.time() - t0) / iters
    rate = args[0].shape[0] / dt
    log(f"  {name}: {rate:.3e} gathers/s  ({dt*1e3:.2f} ms per "
        f"{args[0].shape[0]//1024}k)")
    return rate


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

        # XLA elem baseline (exp_probe_sol's number, re-measured here)
        @jax.jit
        def elem(idx, words):
            return words[idx]

        r = timed(f"elem 2^{wlog}", elem, idx, words)
        results[f"elem_{wlog}"] = r

        for BQ in (256, 512):
            for sector in (1, 8):
                name = f"dma{sector} BQ={BQ} 2^{wlog}"
                try:
                    got = np.asarray(
                        dma_probe(idx, words, BQ=BQ, sector=sector)
                    )
                    if not np.array_equal(got, want):
                        bad = np.nonzero(got != want)[0]
                        log(f"  {name}: WRONG at {bad[:5]} "
                            f"(got {got[bad[:3]]}, want {want[bad[:3]]})")
                        continue
                    r = timed(
                        name,
                        lambda i, w: dma_probe(i, w, BQ=BQ, sector=sector),
                        idx, words,
                    )
                    results[f"dma{sector}_{BQ}_{wlog}"] = r
                except Exception as e:
                    log(f"  {name}: FAILED {type(e).__name__}: "
                        f"{str(e)[:160]}")

        if n_words * 4 <= (1 << 22):  # VMEM-sized tables only
            try:
                got = np.asarray(vmem_probe(idx, words, BQ=512))
                assert np.array_equal(got, want)
                r = timed(
                    f"vmem 2^{wlog}",
                    lambda i, w: vmem_probe(i, w, BQ=512), idx, words,
                )
                results[f"vmem_{wlog}"] = r
            except Exception as e:
                log(f"  vmem 2^{wlog}: FAILED {type(e).__name__}: "
                    f"{str(e)[:160]}")

    # VMEM scalar-gather rate on a 4 MB table
    wlog = 20
    n_words = 1 << wlog
    words = jnp.asarray(rng.integers(0, 2**32, size=n_words, dtype=np.uint32))
    idx = jnp.asarray(
        rng.integers(0, n_words, size=B, dtype=np.int64).astype(np.int32)
    )
    want = np.asarray(words[idx])
    log(f"-- table 2^{wlog} words (4 MB, VMEM) --")
    try:
        got = np.asarray(vmem_probe(idx, words, BQ=512))
        assert np.array_equal(got, want), "vmem gather mismatch"
        results["vmem_20"] = timed(
            "vmem 2^20", lambda i, w: vmem_probe(i, w, BQ=512), idx, words
        )
    except Exception as e:
        log(f"  vmem 2^20: FAILED {type(e).__name__}: {str(e)[:160]}")

    log("JSON " + str({k: f"{v:.4e}" for k, v in sorted(results.items())}))


if __name__ == "__main__":
    main()
