"""Brute-force engines: recover keys 1..32 from their addresses/hashes
(the reference's tests/1to32.txt / 1to32.rmd / 1to32.eth acceptance
fixtures, regenerated exactly from the golden reference)."""

import numpy as np
import pytest

from keyhuntm1cpu_tpu.engine.brute import BruteEngine, BruteParams
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import TargetSet, targets_from_ints

PARAMS = BruteParams(walkers=2, block_u=64, steps_per_chunk=2, chain_len=8)

KEYS_1_32 = list(range(1, 33))
PTS = {k: ecref.scalar_mult(k) for k in KEYS_1_32}


def _target_set(kind):
    if kind == "rmd160":
        raw = [hashref.pubkey_to_hash160(PTS[k], compressed=True) for k in KEYS_1_32]
    elif kind == "address_u":
        raw = [hashref.pubkey_to_hash160(PTS[k], compressed=False) for k in KEYS_1_32]
    elif kind == "eth":
        raw = [hashref.pubkey_to_eth_address(PTS[k]) for k in KEYS_1_32]
    elif kind == "xpoint":
        raw = [PTS[k][0].to_bytes(32, "big") for k in KEYS_1_32]
    return targets_from_ints("hash160" if kind in ("rmd160", "address_u") else kind, raw)


@pytest.mark.parametrize("mode", ["rmd160", "xpoint", "eth", "address_u"])
def test_recover_keys_1_to_32(mode):
    ts = _target_set(mode)
    eng = BruteEngine(ts, 1, 4096, mode=mode, params=PARAMS)
    found = eng.search()
    got = sorted(f.private_key for f in found)
    assert got == KEYS_1_32, f"{mode}: {got}"


def test_recover_key_deeper_in_range():
    key = 0x123456
    pt = ecref.scalar_mult(key)
    ts = targets_from_ints("hash160", [hashref.pubkey_to_hash160(pt)])
    eng = BruteEngine(ts, 0x120000, 0x130000, mode="rmd160", params=PARAMS)
    found = eng.search(stop_on_first=True)
    assert [f.private_key for f in found] == [key]
    assert found[0].target == hashref.pubkey_to_hash160(pt).hex()


def test_no_false_positives_on_empty_window():
    key = 0x999999
    pt = ecref.scalar_mult(key)
    ts = targets_from_ints("hash160", [hashref.pubkey_to_hash160(pt)])
    eng = BruteEngine(ts, 0x10000, 0x14000, mode="rmd160", params=PARAMS)
    assert eng.search() == []


@pytest.mark.parametrize("mode", ["rmd160", "xpoint"])
def test_endomorphism_recovers_lambda_keys(mode):
    """With -e, a walk over k recovers targets at lambda*k and lambda^2*k
    (reference endomorphism lanes, keyhunt.cpp:2646-2677)."""
    k = 0x1234
    lam_k = k * ecref.LAMBDA % ecref.N
    lam2_k = k * ecref.LAMBDA % ecref.N * ecref.LAMBDA % ecref.N
    pts = [ecref.scalar_mult(v) for v in (lam_k, lam2_k)]
    if mode == "rmd160":
        raw = [hashref.pubkey_to_hash160(pt) for pt in pts]
        ts = targets_from_ints("hash160", raw)
    else:
        raw = [pt[0].to_bytes(32, "big") for pt in pts]
        ts = targets_from_ints("xpoint", raw)
    params = BruteParams(walkers=2, block_u=64, steps_per_chunk=2, chain_len=8, endo=True)
    # scan the small range around k only: the lambda*k keys are astronomically
    # far away, reachable only through the endomorphism lanes
    eng = BruteEngine(ts, 0x1000, 0x1400, mode=mode, params=params)
    found = eng.search()
    got = sorted(f.private_key for f in found)
    assert got == sorted([lam_k, lam2_k]), got


def test_address_mode_parsing(tmp_path):
    # address targets given as base58 (reference tests/1to32.txt format)
    from keyhuntm1cpu_tpu.utils.targets import parse_target_file

    path = tmp_path / "targets.txt"
    addrs = [hashref.pubkey_to_address(PTS[k]) for k in (5, 6, 7)]
    path.write_text("\n".join(addrs) + "\n")
    ts = parse_target_file(str(path), "address")
    eng = BruteEngine(ts, 1, 1024, mode="address", params=PARAMS)
    found = eng.search()
    assert sorted(f.private_key for f in found) == [5, 6, 7]
    assert sorted(f.target for f in found) == sorted(addrs)


def test_stride_scan():
    """Stride (-I): only keys a + j*stride are scanned — a key ON the
    stride lattice is found, one OFF it is not."""
    stride = 16
    a = 0x50000
    on = a + 200 * stride
    off = on + 1
    ts = targets_from_ints(
        "hash160",
        [hashref.pubkey_to_hash160(ecref.scalar_mult(k)) for k in (on, off)],
    )
    params = BruteParams(walkers=2, block_u=64, steps_per_chunk=2, chain_len=8,
                         stride=stride)
    eng = BruteEngine(ts, a, a + 0x4000 * stride, mode="rmd160", params=params)
    found = eng.search()
    assert sorted(f.private_key for f in found) == [on]


def test_random_mode_finds_key():
    """Random re-basing (-R) still covers the range and recovers a key
    (deterministic seed makes the test stable)."""
    key = 0x42424
    pt = ecref.scalar_mult(key)
    ts = targets_from_ints("hash160", [hashref.pubkey_to_hash160(pt)])
    params = BruteParams(walkers=4, block_u=64, steps_per_chunk=2, chain_len=8,
                         random_mode=True, seed=7)
    eng = BruteEngine(ts, 0x40000, 0x48000, mode="rmd160", params=params)
    # enough random chunks to cover a small range with high probability
    found = eng.search(max_steps=256, stop_on_first=True)
    assert [f.private_key for f in found] == [key]


def test_target_cache_roundtrip(tmp_path, monkeypatch):
    """Content-addressed target cache (reference data_<sha>.dat analog)."""
    from keyhuntm1cpu_tpu.utils.targets import (
        cache_path_for,
        parse_target_file_cached,
    )

    f = tmp_path / "targets.rmd"
    h1 = hashref.pubkey_to_hash160(ecref.scalar_mult(1))
    h2 = hashref.pubkey_to_hash160(ecref.scalar_mult(2))
    f.write_text(h1.hex() + "\n" + h2.hex() + "\n")
    ts1 = parse_target_file_cached(str(f), "rmd160")
    import os

    cp = cache_path_for(str(f), "rmd160")
    assert os.path.exists(cp)
    ts2 = parse_target_file_cached(str(f), "rmd160")  # from cache
    assert ts2.raw == ts1.raw == [h1, h2]
    assert ts2.labels == ts1.labels
    assert ts2.kind == "hash160"

    # pubkey kind preserves parsed points through the cache
    pf = tmp_path / "t.pub"
    pt = ecref.scalar_mult(99)
    pf.write_text(f"{2 + (pt[1] & 1):02x}{pt[0]:064x}\n")
    p1 = parse_target_file_cached(str(pf), "pubkey")
    p2 = parse_target_file_cached(str(pf), "pubkey")
    assert p1.pubkeys == p2.pubkeys == [pt]


def test_random_mode_seq_per_base_finds_key():
    """-R with -n (seq_per_base): each random base scans N sequential
    keys via chained chunks before re-basing (reference N_SEQUENTIAL_MAX,
    keyhunt.cpp:2552-2568) and still recovers a planted key."""
    key = 0x42D11
    pt = ecref.scalar_mult(key)
    ts = targets_from_ints("hash160", [hashref.pubkey_to_hash160(pt)])
    window = 2 * 64 + 1
    # 4 chunks per base: N = 4 chunks * (K=2 steps * window keys)
    n = 4 * 2 * window
    params = BruteParams(walkers=4, block_u=64, steps_per_chunk=2,
                         chain_len=8, random_mode=True, seed=3,
                         seq_per_base=n)
    eng = BruteEngine(ts, 0x40000, 0x48000, mode="rmd160", params=params)
    found = eng.search(max_steps=512, stop_on_first=True)
    assert [f.private_key for f in found] == [key]


def test_seq_per_base_groups_draws():
    """With seq_per_base = G chunks' worth of keys, the engine draws a
    fresh random base only every G chunks (observable through the rng
    stream: fewer draws than chunks)."""
    import numpy as np

    key = 0x42424
    pt = ecref.scalar_mult(key)
    ts = targets_from_ints("hash160", [hashref.pubkey_to_hash160(pt)])
    window = 2 * 32 + 1
    n = 3 * 2 * window  # 3 chunks per base
    params = BruteParams(walkers=2, block_u=32, steps_per_chunk=2,
                         chain_len=8, random_mode=True, seed=11,
                         seq_per_base=n)
    eng = BruteEngine(ts, 0x40000, 0x44000, mode="rmd160", params=params)

    draws = []
    real = np.random.default_rng

    class SpyRng:
        def __init__(self, seed):
            self._r = real(seed)

        def integers(self, *a, **kw):
            out = self._r.integers(*a, **kw)
            draws.append(np.shape(out))
            return out

    orig = np.random.default_rng
    np.random.default_rng = SpyRng
    try:
        eng.search(max_steps=12 * 2)  # 12 chunks
    finally:
        np.random.default_rng = orig
    # 12 chunks at 3 chunks/base -> 4 base draws (each size=walkers)
    assert len(draws) == 4
