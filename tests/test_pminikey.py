"""Pallas minikey validity kernel logic (hash/pminikey.py).

Reference capability: minikey validity filtering (keyhunt.cpp:5698-5739).

The kernel's compute body is the pure tile function minikey_valid_tile
(same pattern as hash/phash.py): these tests run it under plain XLA
against host golden sha256, which covers everything except the pallas
ref IO / grid indexing — validated on hardware by
scripts/check_pminikey.py (the Mosaic-simulator compile of the full
kernel takes >50 min on a 1-CPU host, so it is not in the suite).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from keyhuntm1cpu_tpu.engine import minikeys as mk_mod
from keyhuntm1cpu_tpu.engine.minikeys import (
    MinikeyEngine, MinikeyParams, SUFFIX_LEN,
)
from keyhuntm1cpu_tpu.hash import pminikey
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import targets_from_ints

from test_minikeys_vanity import _find_valid_minikey


def test_div58_magic_exhaustive_plateaus():
    """q = mulhi(v, M) >> 3 must equal v // 58 for ALL v < 58**5.

    floor(v*M/2**35) is monotone in v and floor(v/58) is constant on
    each plateau [58q, 58q+57], so checking both endpoints of every
    plateau is an exhaustive proof.
    """
    N = 58 ** 5
    M = np.uint64(pminikey._DIV58_M)
    q = np.arange(1, N // 58 + 2, dtype=np.uint64)
    for v in (58 * q - 1, np.minimum(58 * q, N - 1)):
        v = v[v < N]
        np.testing.assert_array_equal((v * M) >> np.uint64(35), v // 58)
    # and the plateau containing 0
    v = np.arange(0, 58, dtype=np.uint64)
    np.testing.assert_array_equal((v * M) >> np.uint64(35), v // 58)


def test_div58_tile_path_matches():
    """The 16-bit-limb product path (_div58) == // on random uint32."""
    rng = np.random.default_rng(7)
    v = rng.integers(0, 58 ** 5, size=4096, dtype=np.uint32)
    got = np.asarray(pminikey._div58(jnp.asarray(v)))
    np.testing.assert_array_equal(got, v // 58)


@pytest.mark.parametrize("alphabet", [mk_mod._B58, mk_mod._B58[::-1]])
def test_char_from_digit_runs(alphabet):
    """Run-select digit->char mapping == direct indexing, any alphabet."""
    d = jnp.arange(58, dtype=jnp.uint32)
    got = np.asarray(
        pminikey._char_from_digit(d, pminikey.b58_runs(alphabet))
    )
    want = np.array([ord(c) for c in alphabet], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("alphabet", [
    mk_mod._B58,
    # a custom -8 alphabet (reversed canonical: many single-char runs)
    mk_mod._B58[::-1],
])
def test_valid_tile_matches_host_sha256(alphabet):
    """minikey_valid_tile (the kernel's whole compute body) == host
    golden sha256 over the same lanes."""
    B = 512
    base = 123456789
    prefix17 = "S" + "keyhuntKernelGat"[:16]
    assert len(prefix17) == 17
    msg = np.zeros((1, 23), dtype=np.uint8)
    msg[0, :17] = np.frombuffer(prefix17.encode(), dtype=np.uint8)
    msg[0, 22] = ord("?")
    w23 = mk_mod._pack_block_words(msg, 23)[0]
    v = jnp.asarray(base + np.arange(B, dtype=np.uint32))
    got = np.asarray(
        pminikey.minikey_valid_tile(
            v, [jnp.uint32(w) for w in w23], pminikey.b58_runs(alphabet)
        )
    )
    want = np.zeros(B, dtype=np.uint32)
    for i in range(B):
        digits = []
        x = base + i
        for _ in range(5):
            x, d = divmod(x, 58)
            digits.append(alphabet[d])
        mk = prefix17 + "".join(reversed(digits))
        want[i] = hashref.sha256((mk + "?").encode())[0] == 0
    np.testing.assert_array_equal(got, want)


def test_engine_recovery_xla_validity_v_lane_path():
    """Planted-minikey recovery through the restructured chunk: validity
    mask -> compacted V-lane key sha256/ladder/hash160 (the same finish
    impl the device kernel path feeds)."""
    prefix = "SkeyhuntTPUx"[: 22 - SUFFIX_LEN]
    mk, counter = _find_valid_minikey(prefix)
    k = int.from_bytes(hashref.sha256(mk.encode()), "big")
    pt = ecref.scalar_mult(k)
    ts = targets_from_ints(
        "hash160", [hashref.pubkey_to_hash160(pt, compressed=False)]
    )
    eng = MinikeyEngine(
        ts, prefix=prefix,
        params=MinikeyParams(batch=1024, chain_len=8),
    )
    found = eng.search(max_chunks=(counter // 1024) + 2)
    assert len(found) == 1
    assert found[0].private_key == k
    assert mk in found[0].target


def test_pallas_gating():
    ts = targets_from_ints("hash160", [b"\x01" * 20])
    eng = MinikeyEngine(ts, params=MinikeyParams(batch=1024))
    assert not eng._use_pallas  # conftest forces the CPU backend
    with pytest.raises(ValueError):
        MinikeyEngine(ts, params=MinikeyParams(batch=512, pallas="on"))
    with pytest.raises(ValueError):
        MinikeyEngine(ts, params=MinikeyParams(pallas="bogus"))
