"""Per-kernel achieved-vs-peak accounting (SURVEY §5; VERDICT r2 item 9).

For each hot kernel at its production shape this prints one markdown
table row: wall time per call, XLA's own cost_analysis (flops + bytes),
achieved Gops/s and GB/s, and % of the chip peaks — the speed-of-light
table docs/PERF.md publishes.

Integer kernels (everything here) run on the VPU, so the op peak is the
VPU integer rate, NOT the MXU bf16 peak:
  v5e-lite: ~1.74 GHz x 4 ALUs x (8x128) lanes ~= 7.1 T u32-op/s
  HBM: ~819 GB/s
XLA's cost_analysis under-reports Pallas kernels (it cannot see inside
a custom call), so for pallas_call kernels the op counts are supplied
analytically (ops per lane counted from the kernel body).

Timing: dependent-chained iterations + a final np.asarray value pull —
block_until_ready returns early through the axon tunnel.

Optionally captures a jax.profiler trace per kernel into
/root/repo/.profiles/<name>/ (PROFILE_TRACE=1) for xprof inspection.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

VPU_PEAK = 7.1e12  # u32 op/s (v5e-lite, 4 ALUs x 1024 lanes x 1.74 GHz)
HBM_PEAK = 819e9  # B/s
TRACE = os.environ.get("PROFILE_TRACE", "") == "1"


def log(*a):
    print(*a, flush=True)


ROWS = []


def measure(name, step_fn, state0, *, n_iters, ops_per_call=None,
            bytes_per_call=None, lanes_per_call=None):
    """step_fn(state) -> state (device arrays; chained => serialized)."""
    t0 = time.time()
    state = step_fn(state0)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x.ravel()[0]) if hasattr(x, "ravel") else x, state
    )
    log(f"  [{name}] compile {time.time()-t0:.1f}s")
    if TRACE:
        os.makedirs(f"/root/repo/.profiles/{name}", exist_ok=True)
        with jax.profiler.trace(f"/root/repo/.profiles/{name}"):
            st = state
            for _ in range(3):
                st = step_fn(st)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x.ravel()[0]) if hasattr(x, "ravel") else x,
                st,
            )
    t0 = time.time()
    st = state
    for _ in range(n_iters):
        st = step_fn(st)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x.ravel()[0]) if hasattr(x, "ravel") else x, st
    )
    dt = (time.time() - t0) / n_iters
    gops = (ops_per_call / dt / 1e9) if ops_per_call else float("nan")
    gbs = (bytes_per_call / dt / 1e9) if bytes_per_call else float("nan")
    op_pct = 100 * gops * 1e9 / VPU_PEAK if ops_per_call else float("nan")
    bw_pct = 100 * gbs * 1e9 / HBM_PEAK if bytes_per_call else float("nan")
    rate = (lanes_per_call / dt) if lanes_per_call else float("nan")
    ROWS.append(
        f"| {name} | {dt*1e3:.2f} ms | {rate:.3e}/s | {gops:.0f} Gop/s"
        f" ({op_pct:.0f}%) | {gbs:.1f} GB/s ({bw_pct:.1f}%) |"
    )
    log(ROWS[-1])


# -- analytic per-lane op counts (counted from the kernel bodies) ---------
OPS_SHA256 = 64 * 28 + 48 * 12  # rounds + message schedule (u32 ops)
OPS_RIPEMD = 80 * 2 * 10 + 60  # two parallel 80-step lines + finalize
OPS_HASH160 = OPS_SHA256 + OPS_RIPEMD + 16 * 4  # + splicing/bswap
OPS_MULMOD = 8 * 8 * 6 + 200  # 16-bit split-domain column products + folds
OPS_KECCAK = 24 * (25 * 6 + 25 * 8) * 2  # theta/chi over 2x u32 halves
OPS_MIXED_ADD = 8 * OPS_MULMOD + 7 * 40  # ~8 mul_mod + adds/subs


def bench_pwalk(U=16384, K=256):
    from keyhuntm1cpu_tpu.curve import pwalk

    rng = np.random.default_rng(5)
    mask = np.array([0xFFFFFFFF] * 7 + [0x0FFFFFFF], dtype=np.uint32)

    def lm(n):
        return pwalk.table_to_limb_major(
            rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32) & mask
        )

    tab_x, tab_y = lm(U), lm(U)
    adv_x, adv_y = lm(128)[:, :1], lm(128)[:, :1]  # (8, 1, 128)
    px, py = lm(128)[:, :1], lm(128)[:, :1]

    # step fns MUST be jitted: advance_chain/walk_blocks called eagerly
    # dispatch op-by-op through the ~28 ms tunnel (the r3 run recorded
    # 52 s/call for a ~20 ms kernel that way)
    @jax.jit
    def stepA(state):
        px, py = state
        bx, by, nx, ny, adeg = pwalk.advance_chain(px, py, adv_x, adv_y, K)
        return nx, ny

    # advance chain: K sequential mixed adds + one group inverse (~3 mul/el)
    measure(
        "pwalk A advance_chain K=256", stepA, (px, py), n_iters=20,
        ops_per_call=K * 128 * (OPS_MIXED_ADD + 3 * OPS_MULMOD),
        lanes_per_call=K * 128,
    )

    @jax.jit
    def stepB(state):
        px, py = state
        bx, by, nx, ny, adeg = pwalk.advance_chain(px, py, adv_x, adv_y, K)
        qlo, qhi, deg = pwalk.walk_blocks(bx, by, tab_x, tab_y, U)
        # fold one bit of the walk output into the carried state so XLA
        # cannot dead-code-eliminate the walk kernel
        fb = qhi.sum(dtype=jnp.uint32) & jnp.uint32(1)
        return nx ^ fb, ny

    try:
        measure(
            "pwalk B walk_blocks U=16k K=256", stepB, (px, py), n_iters=10,
            ops_per_call=K * U * (OPS_MIXED_ADD // 2 + 3 * OPS_MULMOD // 2),
            lanes_per_call=K * U,
            bytes_per_call=K * U * 8,  # emitted truncated keys
        )
    except Exception as e:
        log(f"  pwalk B skipped: {type(e).__name__}: {str(e)[:120]}")


def bench_probe(wlog=30, Bq=1 << 19):
    rng = np.random.default_rng(7)
    words = jnp.asarray(rng.integers(0, 2**32, size=1 << wlog, dtype=np.uint32))
    idx0 = jnp.asarray(rng.integers(0, 2**32, size=Bq, dtype=np.uint32))
    mask = jnp.uint32((1 << wlog) - 1)

    # words must be a jit ARGUMENT: closing over it captures the 4 GiB
    # array as an HLO constant, which broke the r3 remote compile
    # ("4.29GB of captured constants" -> transport broken pipe)
    @jax.jit
    def _probe(idx, words):
        got = words[(idx & mask).astype(jnp.int32)]
        return idx * jnp.uint32(1664525) + got.sum(dtype=jnp.uint32)

    step = lambda idx: _probe(idx, words)

    measure(
        f"bitmap probe 2^{wlog} words", step, idx0, n_iters=20,
        bytes_per_call=Bq * 32,  # one 32 B transaction per random word
        lanes_per_call=Bq,
    )


def bench_sorted_lookup(m_log=24, Bq=1 << 19):
    from keyhuntm1cpu_tpu.filter import sorted_table as st

    rng = np.random.default_rng(9)
    m = 1 << m_log
    hi = np.sort(rng.integers(0, 2**32, size=m, dtype=np.uint32))
    lo = rng.integers(0, 2**32, size=m, dtype=np.uint32)
    tab = st.SortedXTable(
        jnp.asarray(hi), jnp.asarray(lo), jnp.arange(m, dtype=jnp.int32)
    )
    q0 = jnp.asarray(rng.integers(0, 2**32, size=Bq, dtype=np.uint32))

    @jax.jit
    def _lookup(q, hi, lo, idx):
        t = st.SortedXTable(hi, lo, idx)
        res = st.lookup(t, q, q)
        return q * jnp.uint32(1664525) + res.found.sum().astype(jnp.uint32)

    step = lambda q: _lookup(q, tab.hi, tab.lo, tab.idx)

    measure(
        f"sorted lookup m=2^{m_log}", step, q0, n_iters=10,
        bytes_per_call=Bq * 32 * (m_log + 1),  # binary-search gather rounds
        lanes_per_call=Bq,
    )


def bench_pminikey(B=1 << 20):
    from keyhuntm1cpu_tpu.hash import pminikey

    w23 = jnp.asarray(
        np.random.default_rng(3).integers(0, 2**32, size=16, dtype=np.uint32)
    )
    alpha = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

    @jax.jit
    def step(base):
        m = pminikey.minikey_valid(base, w23, B=B, alphabet=alpha)
        return base + m.sum(dtype=jnp.uint32) + jnp.uint32(B)

    measure(
        f"pminikey valid B=2^20", step, jnp.uint32(1), n_iters=10,
        ops_per_call=B * (OPS_SHA256 + 5 * 25 + 6 * 4),
        lanes_per_call=B,
    )


def bench_hash160x2(B=1 << 20):
    from keyhuntm1cpu_tpu.hash import phash

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, 2**32, size=(8, B // 128, 128), dtype=np.uint32))

    @jax.jit
    def step(x):
        le, he, lo, ho = phash.hash160_x2_tiles(x)
        s = (le.sum(dtype=jnp.uint32) + ho.sum(dtype=jnp.uint32))
        return x ^ s

    measure(
        "phash hash160x2 B=2^20", step, x, n_iters=10,
        ops_per_call=B * 2 * OPS_HASH160,
        lanes_per_call=B,
    )


def bench_keccak(B=1 << 20):
    from keyhuntm1cpu_tpu.hash import phash

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 2**32, size=(8, B // 128, 128), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 2**32, size=(8, B // 128, 128), dtype=np.uint32))

    @jax.jit
    def step(st):
        x, y = st
        lo, hi = phash.keccak_eth_tiles(x, y)
        s = lo.sum(dtype=jnp.uint32)
        return x ^ s, y

    measure(
        "phash keccak_eth B=2^20", step, (x, y), n_iters=10,
        ops_per_call=B * OPS_KECCAK,
        lanes_per_call=B,
    )


def bench_table_sort(m_log=24):
    rng = np.random.default_rng(8)
    m = 1 << m_log
    hi0 = jnp.asarray(rng.integers(0, 2**32, size=m, dtype=np.uint32))
    lo0 = jnp.asarray(rng.integers(0, 2**32, size=m, dtype=np.uint32))

    @jax.jit
    def step(st):
        hi, lo = st
        shi, slo = jax.lax.sort((hi, lo), num_keys=2)
        return shi ^ jnp.uint32(1), slo

    measure(
        f"table 2-key lax.sort m=2^{m_log}", step, (hi0, lo0), n_iters=5,
        bytes_per_call=m * 8 * (m_log // 2),  # ~log m merge passes
        lanes_per_call=m,
    )


def main():
    log(jax.devices())
    which = sys.argv[1:] or ["all"]
    table = {
        "probe": bench_probe,
        "lookup": bench_sorted_lookup,
        "pminikey": bench_pminikey,
        "hash160": bench_hash160x2,
        "keccak": bench_keccak,
        "sort": bench_table_sort,
        "pwalk": bench_pwalk,
    }
    for name, fn in table.items():
        if "all" in which or name in which:
            log(f"== {name} ==")
            try:
                fn()
            except Exception as e:
                log(f"  {name} FAILED: {type(e).__name__}: {str(e)[:200]}")
    log("")
    log("| kernel | t/call | lanes/s | Gop/s (%VPU) | GB/s (%HBM) |")
    log("|---|---|---|---|---|")
    for r in ROWS:
        log(r)


if __name__ == "__main__":
    main()
