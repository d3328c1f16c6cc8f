"""Minikeys and vanity engines."""

import numpy as np
import pytest

from keyhuntm1cpu_tpu.engine.minikeys import MinikeyEngine, MinikeyParams, SUFFIX_LEN
from keyhuntm1cpu_tpu.engine.vanity import VanityEngine, VanityParams, vanity_intervals
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import targets_from_ints


def _minikey_of(prefix: str, counter: int) -> str:
    alpha = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    digits = []
    v = counter
    for _ in range(SUFFIX_LEN):
        v, d = divmod(v, 58)
        digits.append(alpha[d])
    return prefix + "".join(reversed(digits))


def _find_valid_minikey(prefix: str, start: int = 0):
    c = start
    while True:
        mk = _minikey_of(prefix, c)
        if hashref.sha256((mk + "?").encode())[0] == 0:
            return mk, c
        c += 1


def test_minikey_recovery():
    prefix = "SkeyhuntTPUx"[: 22 - SUFFIX_LEN]
    mk, counter = _find_valid_minikey(prefix)
    k = int.from_bytes(hashref.sha256(mk.encode()), "big")
    pt = ecref.scalar_mult(k)
    # plant BOTH address forms; engine must find via either
    raw = [hashref.pubkey_to_hash160(pt, compressed=False)]
    ts = targets_from_ints("hash160", raw)
    eng = MinikeyEngine(ts, prefix=prefix, params=MinikeyParams(batch=256, chain_len=8))
    found = eng.search(max_chunks=(counter // 256) + 2)
    assert len(found) == 1
    assert found[0].private_key == k
    assert mk in found[0].target


def test_minikey_validity_gate():
    """An INVALID minikey whose key hashes to a target must NOT be reported."""
    prefix = "Stpufilterxy"[: 22 - SUFFIX_LEN]
    # find an invalid minikey
    c = 0
    while hashref.sha256((_minikey_of(prefix, c) + "?").encode())[0] == 0:
        c += 1
    mk = _minikey_of(prefix, c)
    k = int.from_bytes(hashref.sha256(mk.encode()), "big")
    pt = ecref.scalar_mult(k)
    ts = targets_from_ints(
        "hash160", [hashref.pubkey_to_hash160(pt, compressed=False)]
    )
    eng = MinikeyEngine(ts, prefix=prefix, params=MinikeyParams(batch=256, chain_len=8))
    found = eng.search(max_chunks=1)
    assert found == []


def test_vanity_intervals_contain_known_address():
    # address of key 1: 1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH
    h = hashref.pubkey_to_hash160(ecref.G)
    ivs = vanity_intervals("1BgG")
    assert any(lo <= h <= hi for lo, hi in ivs)
    ivs2 = vanity_intervals("1Bh")
    assert not any(lo <= h <= hi for lo, hi in ivs2)


def test_vanity_search_finds_prefix():
    # find which tiny keys produce a usable prefix, then search for it
    params = VanityParams(walkers=2, block_u=32, steps_per_chunk=2, chain_len=8)
    addr = hashref.pubkey_to_address(ecref.scalar_mult(41))
    prefix = addr[:6]
    eng = VanityEngine([prefix], 1, 512, params=params)
    found = eng.search()
    assert any(f.private_key == 41 for f in found)
    for f in found:
        assert f.target.startswith(prefix)


def test_minikey_custom_alphabet():
    """Reference -8: a custom 58-char base58 alphabet changes minikey
    GENERATION (the scanned strings), and recovery must be bit-exact
    under it (keyhunt.cpp:756-765)."""
    alpha = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    custom = alpha[29:] + alpha[:29]  # rotated: many non-contiguous runs

    def mk_of(prefix, counter):
        digits = []
        v = counter
        for _ in range(SUFFIX_LEN):
            v, d = divmod(v, 58)
            digits.append(custom[d])
        return prefix + "".join(reversed(digits))

    prefix = "SkeyhuntALTx"[: 22 - SUFFIX_LEN]
    c = 0
    while hashref.sha256((mk_of(prefix, c) + "?").encode())[0] != 0:
        c += 1
    mk = mk_of(prefix, c)
    k = int.from_bytes(hashref.sha256(mk.encode()), "big")
    pt = ecref.scalar_mult(k)
    ts = targets_from_ints(
        "hash160", [hashref.pubkey_to_hash160(pt, compressed=False)]
    )
    eng = MinikeyEngine(ts, prefix=prefix,
                        params=MinikeyParams(batch=256, chain_len=8),
                        alphabet=custom)
    found = eng.search(max_chunks=(c // 256) + 2)
    assert len(found) == 1
    assert found[0].private_key == k
    assert mk in found[0].target

    # the same scan under the canonical alphabet must NOT produce mk
    eng2 = MinikeyEngine(ts, prefix=prefix,
                         params=MinikeyParams(batch=256, chain_len=8))
    assert eng2.search(max_chunks=(c // 256) + 2) == []


def test_minikey_alphabet_validation():
    import pytest as _pytest

    ts = targets_from_ints("hash160", [b"\x00" * 20])
    with _pytest.raises(ValueError):
        MinikeyEngine(ts, alphabet="abc")  # wrong length
    with _pytest.raises(ValueError):
        MinikeyEngine(ts, alphabet="a" * 58)  # duplicates


def test_minikey_counter_end_bounds_scan():
    """counter_end bounds the scan (fleet unit shape): a key past the
    bound is not scanned; the same range including it recovers it."""
    prefix = "SkeyhuntTPUx"[: 22 - SUFFIX_LEN]
    mk, counter = _find_valid_minikey(prefix)
    k = int.from_bytes(hashref.sha256(mk.encode()), "big")
    pt = ecref.scalar_mult(k)
    ts = targets_from_ints(
        "hash160", [hashref.pubkey_to_hash160(pt, compressed=False)]
    )
    params = MinikeyParams(batch=256, chain_len=8)
    # bound BEFORE the planted counter: nothing found
    eng = MinikeyEngine(ts, prefix=prefix, params=params)
    eng.counter = 0
    found = eng.search(counter_end=max(1, (counter // 256) * 256),
                       stop_on_first=False)
    assert found == []
    # bound AFTER it: recovered
    eng2 = MinikeyEngine(ts, prefix=prefix, params=params)
    eng2.counter = 0
    found = eng2.search(counter_end=counter + 1)
    assert [f.private_key for f in found] == [k]


def test_minikeys_dist_worker_over_counter_units():
    """Fleet minikeys: coordinator units are counter ranges; a worker
    with a fixed prefix recovers the planted minikey in its unit."""
    import threading

    from keyhuntm1cpu_tpu.dist.coordinator import (
        CoordinatorServer, WorkCoordinator,
    )
    from keyhuntm1cpu_tpu.dist.worker import (
        DistributedWorker, minikeys_search_fn,
    )

    prefix = "SkeyhuntTPUx"[: 22 - SUFFIX_LEN]
    mk, counter = _find_valid_minikey(prefix)
    k = int.from_bytes(hashref.sha256(mk.encode()), "big")
    pt = ecref.scalar_mult(k)
    ts = targets_from_ints(
        "hash160", [hashref.pubkey_to_hash160(pt, compressed=False)]
    )
    end = ((counter // 256) + 2) * 256
    coord = WorkCoordinator(0, 2 * end, n_units=2, align=256,
                            lease_s=60.0, stop_on_first=False)
    srv = CoordinatorServer(("127.0.0.1", 0), coord)
    srv.start_background()
    try:
        fn = minikeys_search_fn(
            ts, prefix, params=MinikeyParams(batch=256, chain_len=8)
        )
        w = DistributedWorker("127.0.0.1", srv.server_address[1], fn,
                              worker_id="mkw", poll_s=0.1)
        t = threading.Thread(target=w.run)
        t.start()
        t.join(timeout=300)
        assert not t.is_alive()
        keys = [f["private_key"] for f in coord.found_keys()]
        assert keys == [f"{k:x}"]
    finally:
        srv.shutdown()
