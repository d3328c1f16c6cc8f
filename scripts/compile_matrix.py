"""Kernel-matrix compile regression gate (VERDICT r3 #7).

Compiles (lower + compile, never runs) every production Pallas kernel
configuration on the real device, so a Mosaic legalization break in one
corner of the (mode x hash_rows x bucketed x endo) matrix — like the
08-18 'scf.for' failure that shipped to the device queue
(docs/gates/check_pbrute.log) — is caught the same session it is
introduced, without paying a full correctness-gate run per shape.

Prints one `rc` table row per config; exits nonzero if ANY config fails.
With the persistent compile cache warm this is minutes, not hours.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_matrix.py
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

S = jax.ShapeDtypeStruct
U32 = jnp.uint32

FAILED = []


def log(*a):
    print(*a, flush=True)


def compile_one(name, fn, *args, **statics):
    t0 = time.time()
    try:
        jax.jit(
            fn, static_argnames=tuple(statics)
        ).lower(*args, **statics).compile()
        log(f"| {name} | ok | {time.time()-t0:.1f}s |")
    except Exception as e:
        FAILED.append(name)
        log(f"| {name} | FAIL {type(e).__name__}: {str(e)[:160]} | "
            f"{time.time()-t0:.1f}s |")
        if "--trace" in sys.argv:
            traceback.print_exc()


def pbrute_matrix():
    """Fused brute chunk: production + gate shapes across the live
    config axes. hash_rows=None resolves per-mode (engine defaults)."""
    from keyhuntm1cpu_tpu.curve import pbrute
    from keyhuntm1cpu_tpu.engine.brute import resolve_hash_rows

    def chunk_args(U, K, T=4, TB=0):
        rows = U // 128
        return (
            S((8,), U32), S((8,), U32),                  # px, py
            S((8, rows, 128), U32), S((8, rows, 128), U32),  # table
            S((8,), U32), S((8,), U32),                  # adv
            S((4, 2 * T), U32),                          # pack_intervals(T)
            S((max(TB, 8), 128), U32),                   # pack_buckets rows
        )

    # production shapes: every mode at its resolved default + the A/B
    # extremes; endo lanes for the modes that support them; the bucketed
    # membership path at T=4096 (32 bucket rows)
    U, K, SB, C = 16384, 256, 4, 1024
    for mode in pbrute.MODES:
        hrs = {resolve_hash_rows(mode, U, None), None, 8, 32}
        for hr in sorted(hrs, key=lambda v: (v is None, v)):
            n_endos = (1, 3) if mode in ("rmd160", "xpoint") else (1,)
            for ne in n_endos:
                if ne == 3 and hr not in (resolve_hash_rows(mode, U, None),):
                    continue  # endo x every hr would square the matrix
                compile_one(
                    f"pbrute {mode} hr={hr} endo={ne}",
                    pbrute.pallas_brute_chunk,
                    *chunk_args(U, K),
                    K=K, U=U, SB=SB, C=C, mode=mode, n_endo=ne,
                    hash_rows=hr, n_bucket_rows=0,
                )
    # 48 bucket rows = pack_buckets of a 4096-target set (production T cap)
    compile_one(
        "pbrute rmd160 bucketed T=4096",
        pbrute.pallas_brute_chunk,
        *chunk_args(U, K, TB=48),
        K=K, U=U, SB=SB, C=C, mode="rmd160", n_endo=1,
        hash_rows=resolve_hash_rows("rmd160", U, None), n_bucket_rows=48,
    )
    # gate shapes (block_u=256: single-pass emit path)
    compile_one(
        "pbrute rmd160 gate-shape U=256",
        pbrute.pallas_brute_chunk,
        *chunk_args(256, 4),
        K=4, U=256, SB=4, C=64, mode="rmd160", n_endo=1,
        hash_rows=None, n_bucket_rows=0,
    )


def bsgs_matrix():
    """BSGS pallas chunk at headline shapes x probe modes."""
    from keyhuntm1cpu_tpu.engine import bsgs as bs
    from keyhuntm1cpu_tpu.filter import bitmap as bmp

    U, K, SB, C2, T = 8192, 128, 4, 512, 1
    bits = 35
    n_words = 1 << (bits - 5)
    m = 1 << 20  # table size does not change the kernel shape class

    def args(T):
        return (
            S((T, 8), U32), S((T, 8), U32),
            S((8, U // 128, 128), U32), S((8, U // 128, 128), U32),
            S((8,), U32), S((8,), U32),
            S((n_words,), U32),
            S((m,), U32), S((m,), U32), S((m,), U32),
        )

    for pm in bmp.PROBE_MODES:  # NOT "dma": experimental, known Mosaic
        # compile crash on the current toolchain (gates 09/13/15)
        compile_one(
            f"bsgs pallas chunk probe={pm}",
            bs._pallas_chunk_impl, *args(1),
            T=T, U=U, K=K, C2=C2, SB=SB, bits_log2=bits, probe_mode=pm,
        )
    # multi-target grouped path (T=16 summary shapes)
    compile_one(
        "bsgs pallas chunk T=16",
        bs._pallas_chunk_impl, *args(16),
        T=16, U=U, K=32, C2=C2, SB=SB, bits_log2=bits, probe_mode=None,
    )
    # cascade2 headline config (m=2^28 defaults: level-2 bloom words2 +
    # per-stage budgets + the gate-20 tuned block shapes)
    U2, K2 = 16384, 256
    args2 = (
        S((1, 8), U32), S((1, 8), U32),
        S((8, U2 // 128, 128), U32), S((8, U2 // 128, 128), U32),
        S((8,), U32), S((8,), U32),
        S((n_words,), U32),
        S((m,), U32), S((m,), U32), S((m,), U32),
        S((1 << 27, ), U32),  # bloom2 words (2^32 bits)
    )
    compile_one(
        "bsgs pallas chunk cascade2 U=16k K=256",
        bs._pallas_chunk_impl, *args2,
        T=1, U=U2, K=K2, C2=1024, SB=SB, bits_log2=bits, probe_mode=None,
        b2_bits=32, C1=17920,
    )


def hash_and_minikey():
    from keyhuntm1cpu_tpu.hash import phash, pminikey

    B = 1 << 20
    x = S((8, B // 128, 128), U32)
    compile_one("phash hash160_x2_tiles", phash.hash160_x2_tiles, x)
    compile_one("phash keccak_eth_tiles", phash.keccak_eth_tiles, x, x)
    compile_one(
        "pminikey valid B=2^20",
        lambda base, w: pminikey.minikey_valid(
            base, w, B=B,
            alphabet="123456789ABCDEFGHJKLMNPQRSTUVWXYZ"
                     "abcdefghijkmnopqrstuvwxyz",
        ),
        S((), U32), S((16,), U32),
    )


def pwalk_matrix():
    from keyhuntm1cpu_tpu.curve import pwalk

    U, K = 16384, 256
    base = S((8, K, 128), U32)
    tab = S((8, U // 128, 128), U32)
    one = S((8, 1, 128), U32)
    compile_one(
        "pwalk advance_chain K=256",
        lambda px, py, ax, ay: pwalk.advance_chain(px, py, ax, ay, K),
        one, one, one, one,
    )
    compile_one(
        "pwalk walk_blocks U=16k",
        lambda bx, by, tx, ty: pwalk.walk_blocks(bx, by, tx, ty, U),
        base, base, tab, tab,
    )


def main():
    log(jax.devices())
    log("| config | rc | compile |")
    log("|---|---|---|")
    which = set(sys.argv[1:]) - {"--trace"} or {"all"}
    for name, fn in (
        ("pbrute", pbrute_matrix),
        ("bsgs", bsgs_matrix),
        ("hash", hash_and_minikey),
        ("pwalk", pwalk_matrix),
    ):
        if "all" in which or name in which:
            fn()
    if FAILED:
        log(f"COMPILE MATRIX: {len(FAILED)} FAILED: {FAILED}")
        sys.exit(1)
    log("COMPILE MATRIX: all configs ok")


if __name__ == "__main__":
    main()
