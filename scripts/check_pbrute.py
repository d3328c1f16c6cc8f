"""Ad-hoc correctness drive of the fused brute pipeline (interpret mode)."""
import os

pass  # run on the real backend (interpret mode is too slow for these kernels)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import sys

import jax as _j
_j.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from keyhuntm1cpu_tpu.engine.brute import BruteEngine, BruteParams
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import TargetSet

ONLY = sys.argv[1] if len(sys.argv) > 1 else "all"
# CHECK_HASH_ROWS=8 gates the emit sub-blocking variant (block_u=256 ->
# rows=2, so hr must equal 2 or divide into nothing; use block_u=1024
# when sub-blocking) on the same bit-exact recoveries
HR = os.environ.get("CHECK_HASH_ROWS")
HR = int(HR) if HR else None
BU = int(os.environ.get("CHECK_BLOCK_U", 1024 if HR else 256))

params = BruteParams(
    block_u=BU, steps_per_chunk=4, pallas_sb=4, pallas="on", chunk_cand=64,
    hash_rows=HR,
)

for mode, mk in () if ONLY in ("extras", "buckets") else (
    ("rmd160", lambda pt: hashref.pubkey_to_hash160(pt, compressed=True)),
    ("xpoint", lambda pt: pt[0].to_bytes(32, "big")),
    ("eth", lambda pt: hashref.pubkey_to_eth_address(pt)),
    ("address_u", lambda pt: hashref.pubkey_to_hash160(pt, compressed=False)),
):
    keys = list(range(1, 33)) + [1000, 4000]
    raw = [mk(ecref.scalar_mult(k)) for k in keys]
    kind = {"rmd160": "hash160", "xpoint": "xpoint", "eth": "eth",
            "address_u": "hash160"}[mode]
    ts = TargetSet(kind=kind, raw=raw, labels=[f"k{k}" for k in keys])
    eng = BruteEngine(ts, 1, 4097, mode=mode, params=params)
    assert eng._fast, mode
    found = eng.search()
    got = sorted(f.private_key for f in found)
    missing = [k for k in keys if k not in got]
    extra = [k for k in got if k not in keys and ecref.N - k not in keys]
    print(f"{mode}: found {len(got)}/{len(keys)} missing={missing} extra={extra}")
    assert not missing, (mode, missing)

# endomorphism lanes: plant lambda*k and lambda^2*k artifacts, scan small k
if ONLY in ("extras", "buckets"):
    lam = None
else:
    lam = ecref.LAMBDA
keys = [] if ONLY in ("extras", "buckets") else [5, 17]
raw = []
for k in keys:
    raw.append(hashref.pubkey_to_hash160(ecref.scalar_mult(k * lam % ecref.N), True))
    raw.append(
        hashref.pubkey_to_hash160(
            ecref.scalar_mult(k * lam * lam % ecref.N), True
        )
    )
if ONLY not in ("extras", "buckets"):
    ts = TargetSet(kind="hash160", raw=raw, labels=[str(i) for i in range(len(raw))])
    p2 = BruteParams(block_u=BU, steps_per_chunk=4, pallas_sb=4, pallas="on",
                     chunk_cand=64, endo=True, hash_rows=HR)
    eng = BruteEngine(ts, 1, 1025, mode="rmd160", params=p2)
    found = eng.search()
    got = sorted(f.private_key for f in found)
    want = sorted(
        v
        for k in keys
        for v in (k * lam % ecref.N, k * lam * lam % ecref.N)
    )
    print("endo found:", [hex(g) for g in got])
    assert set(want) <= set(got) | {ecref.N - g for g in got}, (want, got)
    print("ALL OK")

# ---- round-2 additions: rmd160_both (-l both), intervals (vanity), composition
from keyhuntm1cpu_tpu.engine.vanity import vanity_intervals
from keyhuntm1cpu_tpu.utils.targets import TargetSet

if ONLY != "buckets":
    params_b = BruteParams(block_u=BU, steps_per_chunk=4, pallas_sb=4,
                           hash_rows=HR,
                           pallas="on", chunk_cand=64)
    raw = [hashref.pubkey_to_hash160(ecref.scalar_mult(5), compressed=True),
           hashref.pubkey_to_hash160(ecref.scalar_mult(9), compressed=False)]
    ts = TargetSet(kind="hash160", raw=raw, labels=["c5", "u9"])
    eng = BruteEngine(ts, 1, 2049, mode="rmd160_both", params=params_b)
    assert eng._fast
    got = sorted(f.private_key for f in eng.search())
    assert got == [5, 9], got
    print("rmd160_both fused: OK (compressed + uncompressed forms)")

    # vanity interval: prefix of key 777's compressed address
    addr = hashref.pubkey_to_address(ecref.scalar_mult(777), compressed=True)
    ivs = vanity_intervals(addr[:5])
    eng = BruteEngine(TargetSet(kind="hash160", raw=[], labels=[]), 1, 2049,
                      mode="rmd160", params=params_b,
                      intervals=ivs, prefixes=[addr[:5]])
    found = eng.search()
    assert any(f.private_key == 777 for f in found), found
    print(f"vanity interval fused: OK (prefix {addr[:5]} -> key 777)")

    # composition: exact target + vanity interval in ONE scan
    raw = [hashref.pubkey_to_hash160(ecref.scalar_mult(31), compressed=True)]
    eng = BruteEngine(TargetSet(kind="hash160", raw=raw, labels=["c31"]),
                      1, 2049, mode="rmd160", params=params_b,
                      intervals=ivs, prefixes=[addr[:5]])
    got = sorted(f.private_key for f in eng.search(stop_on_first=False))
    assert 31 in got and 777 in got, got
    print("vanity + address composition fused: OK (both found in one scan)")

    # vanity + endomorphism (reference -m vanity -e, keyhunt.cpp:5749):
    # plant the prefix of LAMBDA*777's address; the scan only walks
    # k=1..2048, so the hit MUST come through the x*beta endo lane and
    # the lambda^e key reconstruction (brute.py _decode_fast).
    k_e = ecref.LAMBDA * 777 % ecref.N
    addr_e = hashref.pubkey_to_address(ecref.scalar_mult(k_e), compressed=True)
    ivs_e = vanity_intervals(addr_e[:6])
    import dataclasses as _dc
    eng = BruteEngine(TargetSet(kind="hash160", raw=[], labels=[]), 1, 2049,
                      mode="rmd160",
                      params=_dc.replace(params_b, endo=True),
                      intervals=ivs_e, prefixes=[addr_e[:6]])
    assert eng.stats.multiplier == 6, eng.stats.multiplier
    found = eng.search()
    assert any(f.private_key == k_e for f in found), found
    print(f"vanity + endo fused: OK (prefix {addr_e[:6]} -> lambda*777, x6)")
    print("ROUND2 EXTRAS OK")

# ---- bucketed membership (T > compare_max): planted keys among decoys.
# Decoys are synthetic 20-byte values (membership only compares the
# first 8 bytes, so any bytes exercise the bucket table); block_u=1024
# keeps the gather tiles at full (8, 128) registers.
if ONLY == "buckets" or (ONLY == "all" and HR is None):
    # skipped in CHECK_HASH_ROWS runs: those gate the emit sub-blocking,
    # and repeating the bucket compiles would double tunnel time
    import hashlib

    for mode, mk, kind in (
        ("rmd160",
         lambda pt: hashref.pubkey_to_hash160(pt, compressed=True),
         "hash160"),
        ("xpoint", lambda pt: pt[0].to_bytes(32, "big"), "xpoint"),
    ):
        keys = list(range(1, 33)) + [999, 3333]
        raw = [mk(ecref.scalar_mult(k)) for k in keys]
        nb = 32 if kind == "xpoint" else 20
        decoys = [
            hashlib.sha256(f"decoy{i}".encode()).digest()[:nb]
            for i in range(1500)
        ]
        ts = TargetSet(kind=kind, raw=raw + decoys,
                       labels=[f"k{k}" for k in keys]
                       + [f"d{i}" for i in range(len(decoys))])
        pb = BruteParams(block_u=1024, steps_per_chunk=4, pallas_sb=4,
                         pallas="on", chunk_cand=64, hash_rows=HR)
        eng = BruteEngine(ts, 1, 4097, mode=mode, params=pb)
        assert eng._fast and eng._bucketed, (mode, eng._bucketed)
        found = eng.search()
        got = sorted(f.private_key for f in found)
        missing = [k for k in keys if k not in got]
        print(f"bucketed {mode}: T={len(ts.raw)} rows={eng._n_bucket_rows} "
              f"found {len(got)}/{len(keys)} missing={missing}")
        assert not missing, (mode, missing)

    # composition: bucketed exact set + vanity interval in ONE scan
    # (intervals stay in SMEM while exact targets ride the buckets)
    from keyhuntm1cpu_tpu.engine.vanity import vanity_intervals

    addr = hashref.pubkey_to_address(ecref.scalar_mult(777), compressed=True)
    ivs = vanity_intervals(addr[:5])
    raw = [hashref.pubkey_to_hash160(ecref.scalar_mult(k), True)
           for k in (31, 999)]
    decoys = [hashlib.sha256(f"cmp{i}".encode()).digest()[:20]
              for i in range(1200)]
    ts = TargetSet(kind="hash160", raw=raw + decoys,
                   labels=["k31", "k999"]
                   + [f"d{i}" for i in range(len(decoys))])
    eng = BruteEngine(ts, 1, 4097, mode="rmd160",
                      params=BruteParams(block_u=1024, steps_per_chunk=4,
                                         pallas_sb=4, pallas="on",
                                         chunk_cand=64, hash_rows=HR),
                      intervals=ivs, prefixes=[addr[:5]])
    assert eng._bucketed and len(eng.intervals) == len(ivs)
    got = sorted(f.private_key for f in eng.search(stop_on_first=False))
    assert 31 in got and 999 in got and 777 in got, got
    print("bucketed + interval composition: OK (31, 999, 777 in one scan)")
    print("BUCKETED OK")
