"""Compaction-strategy shootout for the BSGS chunk (round 4).

The chunk cascade is probe -> compact survivors -> exact lookup
(filter/bitmap.py filtered_lookup). With the probe measured at 6.2e7
queries/s (8.4 ms per 512k, gate 11) and the walk at 2.4e8 pts/s, the
remaining per-chunk cost is the compaction: jnp.nonzero(size=C) over
the FULL (B,) probe mask (B = K*U ~ 0.5-1M, survivors ~B*2^-10).

Strategies timed at B = 2^19 and 2^20, C = 1024, ~512 survivors:

  flat     (current) jnp.nonzero(mask, size=C) over (B,)
  hier     row-reduce to (B/128,) any-mask -> nonzero over rows (C) ->
           gather the C hit rows -> nonzero over (C*128,): the wide
           nonzero shrinks from B to B/128 + C*128 elements
  cumsum   manual compaction: exclusive cumsum of the mask -> scatter
           positions (the classic stream-compact; measures whether
           XLA's nonzero lowering leaves anything on the table)

Each strategy is verified against np.nonzero before timing. The winner
ships inside filtered_lookup (same contract: positions padded with B).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_compact.py
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


def log(*a):
    print(*a, flush=True)


@functools.partial(jax.jit, static_argnames=("C",))
def flat(mask, C: int):
    B = mask.shape[0]
    (pos,) = jnp.nonzero(mask, size=C, fill_value=B)
    return pos.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("C",))
def hier(mask, C: int):
    B = mask.shape[0]
    R = B // 128
    rows = mask.reshape(R, 128)
    rowhit = rows.any(axis=1)
    # every hit row holds >= 1 survivor, so #hit rows <= #survivors <= C
    (rpos,) = jnp.nonzero(rowhit, size=C, fill_value=R)
    sub = rows[jnp.minimum(rpos, R - 1)] & (rpos < R)[:, None]
    (spos,) = jnp.nonzero(sub.reshape(-1), size=C, fill_value=C * 128)
    srow = jnp.minimum(spos // 128, C - 1)
    pos = rpos[srow] * 128 + (spos % 128)
    return jnp.where(spos < C * 128, pos, B).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("C",))
def cumsum(mask, C: int):
    B = mask.shape[0]
    m = mask.astype(jnp.int32)
    slot = jnp.cumsum(m) - m  # exclusive: survivor i's output slot
    idx = jnp.where(mask, jnp.minimum(slot, C - 1), C)
    pos = jnp.full((C + 1,), B, jnp.int32).at[idx].min(
        jnp.arange(B, dtype=jnp.int32), mode="drop"
    )
    return pos[:C]


def timed(name, fn, mask, C, iters=20):
    t0 = time.time()
    np.asarray(fn(mask, C=C)[:1])
    log(f"  [{name}] compile+warm {time.time()-t0:.1f}s")
    t0 = time.time()
    outs = [fn(mask, C=C) for _ in range(iters)]
    np.asarray(outs[-1][:1])  # ONE sync (device queue is FIFO): per-
    dt = (time.time() - t0) / iters  # output pulls pay ~28 ms RTT each
    log(f"  {name}: {dt*1e3:.3f} ms per {mask.shape[0]//1024}k "
        f"({mask.shape[0]/dt:.3e} elems/s)")
    return dt


def main():
    log(jax.devices())
    rng = np.random.default_rng(5)
    results = {}
    for blog in (19, 20):
        B, C = 1 << blog, 1024
        mask_np = np.zeros(B, bool)
        mask_np[rng.choice(B, size=512, replace=False)] = True
        mask = jnp.asarray(mask_np)
        want = np.flatnonzero(mask_np)
        log(f"-- B=2^{blog}, 512 survivors, C={C} --")
        for name, fn in (("flat", flat), ("hier", hier), ("cumsum", cumsum)):
            got = np.asarray(fn(mask, C=C))
            got = got[got < B]
            if not np.array_equal(np.sort(got), want):
                log(f"  {name}: WRONG ({len(got)} vs {len(want)} survivors)")
                continue
            results[f"{name}_{blog}"] = timed(name, fn, mask, C)
    log("JSON " + str({k: f"{v*1e3:.3f}ms" for k, v in results.items()}))


if __name__ == "__main__":
    main()
