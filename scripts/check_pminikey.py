"""Device gate: Pallas minikey validity kernel (hash/pminikey.py).

1. Bit-exactness: kernel mask == XLA sha256 mask at B=262144 over
   random bases (canonical + one custom alphabet).
2. Recovery: the engine with pallas='auto' (kernel on) finds a planted
   valid minikey.
3. Throughput: minikeys/s of the full engine pipeline at production
   batch, vs the XLA path — the round-2 number to beat is 20.4M/s
   (VERDICT r2 item 5 target: >= 100M/s).
"""

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


def gate_bitexact():
    from keyhuntm1cpu_tpu.engine import minikeys as mk
    from keyhuntm1cpu_tpu.hash import pminikey
    from keyhuntm1cpu_tpu.hash.sha256 import sha256_block_words

    B = 262144
    prefix17 = "S" + "deviceGateMiniKy"[:16]
    msg = np.zeros((1, 23), dtype=np.uint8)
    msg[0, :17] = np.frombuffer(prefix17.encode(), dtype=np.uint8)
    msg[0, 22] = ord("?")
    w23 = jnp.asarray(mk._pack_block_words(msg, 23)[0])
    for alphabet in (mk._B58, mk._B58[::-1]):
        for base in (0, 123456789, 58**5 - B):
            got = np.asarray(
                pminikey.minikey_valid(
                    jnp.uint32(base), w23, B=B, alphabet=alphabet
                )
            )
            v = jnp.uint32(base) + jnp.arange(B, dtype=jnp.uint32)
            w4or, w5or = mk._suffix_or_words(v, alphabet)
            want = np.asarray(
                (
                    sha256_block_words(mk._mk_words(w23, w4or, w5or, B))[0]
                    >> jnp.uint32(24)
                )
                == 0
            ).astype(np.uint32)
            assert np.array_equal(got, want), (
                f"MISMATCH alphabet={alphabet[:8]}... base={base}: "
                f"{np.nonzero(got != want)[0][:8]}"
            )
            log(f"bitexact OK base={base} alpha={alphabet[:8]}... "
                f"({int(got.sum())}/{B} valid)")


def gate_recovery():
    from keyhuntm1cpu_tpu.engine.minikeys import (
        MinikeyEngine, MinikeyParams, SUFFIX_LEN,
    )
    from keyhuntm1cpu_tpu.ref import ecref, hashref
    from keyhuntm1cpu_tpu.utils.targets import targets_from_ints

    prefix = "SdeviceMiniGate"[: 22 - SUFFIX_LEN]
    c = 0
    while True:
        digits = []
        v = c
        alpha = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
        for _ in range(SUFFIX_LEN):
            v, d = divmod(v, 58)
            digits.append(alpha[d])
        mk = prefix + "".join(reversed(digits))
        if hashref.sha256((mk + "?").encode())[0] == 0:
            break
        c += 1
    k = int.from_bytes(hashref.sha256(mk.encode()), "big")
    pt = ecref.scalar_mult(k)
    ts = targets_from_ints(
        "hash160", [hashref.pubkey_to_hash160(pt, compressed=False)]
    )
    eng = MinikeyEngine(ts, prefix=prefix, params=MinikeyParams())
    assert eng._use_pallas, "expected the kernel path on a real device"
    found = eng.search(max_chunks=2)
    assert [f.private_key for f in found] == [k], found
    log(f"recovery OK (planted minikey {mk} at counter {c})")


def gate_throughput(seconds=10.0):
    from keyhuntm1cpu_tpu.engine.minikeys import MinikeyEngine, MinikeyParams
    from keyhuntm1cpu_tpu.utils.targets import targets_from_ints

    # Decoys must have entropy in the LEADING 8 bytes: the device filter
    # keys on digest[:8], and small ints would collapse both targets to
    # the degenerate all-zero key64 (advisor r3 finding).
    rng = np.random.default_rng(0xC0FFEE)
    ts = targets_from_ints("hash160", [rng.bytes(20), rng.bytes(20)])
    # batch-size sweep knobs (valid_max must scale: expected valid lanes
    # are B/256, and overflow falls back to the exact host rescan)
    import os

    from keyhuntm1cpu_tpu.engine.minikeys import tuned_params

    B = int(os.environ.get("PMK_BATCH", 0)) or None
    for label, pallas in (("pallas", "auto"), ("xla", "off")):
        eng = MinikeyEngine(ts, params=tuned_params(pallas=pallas, batch=B))
        # warm/compile
        eng.search(max_chunks=2, stop_on_first=False)
        n0 = eng.stats.keys_covered
        t0 = time.time()
        done = 0
        while time.time() - t0 < seconds:
            eng.search(max_chunks=8, stop_on_first=False)
            done += 8
        dt = time.time() - t0
        rate = (eng.stats.keys_covered - n0) / dt
        log(f"throughput[{label}]: {rate:.3e} minikeys/s "
            f"({done} chunks in {dt:.1f}s)")


if __name__ == "__main__":
    log(jax.devices())
    gate_bitexact()
    gate_recovery()
    gate_throughput()
    log("check_pminikey: ALL GATES PASSED")
