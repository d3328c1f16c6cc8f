"""Native host library (C++) vs the pure-python golden reference."""

import random
import subprocess

import numpy as np
import pytest

from keyhuntm1cpu_tpu import native
from keyhuntm1cpu_tpu.ref import ecref, hashref


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    if not native.available():
        try:
            subprocess.run(["make", "-C", "native"], check=True, capture_output=True)
        except Exception:
            pytest.skip("no C++ toolchain; python fallback covered elsewhere")
    if not native.available():
        pytest.skip("native lib unavailable")


def test_sha256_vectors():
    import hashlib

    for msg in (b"", b"abc", b"x" * 55, b"y" * 56, b"z" * 64, b"w" * 100):
        assert native.sha256(msg) == hashlib.sha256(msg).digest()


def test_hash160():
    assert (
        native.hash160(ecref.serialize_pubkey(ecref.G)).hex()
        == "751e76e8199196d454941c45d1b3a323f1433bd6"
    )


def test_scalar_mult_matches_golden():
    random.seed(11)
    keys = [1, 2, ecref.N - 1, 0x7CCE5EFDACCF6808] + [
        random.randrange(1, ecref.N) for _ in range(20)
    ]
    for k in keys:
        assert native.scalar_mult(k) == ecref.scalar_mult(k), hex(k)


def test_parse_addresses_bulk():
    addrs = [hashref.pubkey_to_address(ecref.scalar_mult(k)) for k in range(1, 33)]
    text = ("\n".join(addrs) + "\nnotanaddress\n").encode()
    out = native.parse_addresses(text, 64)
    assert len(out) == 33
    for i, k in enumerate(range(1, 33)):
        assert out[i].tobytes() == hashref.pubkey_to_hash160(ecref.scalar_mult(k))
    assert out[32].tobytes() == b"\x00" * 20  # bad line -> zeros


def test_verify_batch():
    keys = [41, 42, 43]
    target = hashref.pubkey_to_hash160(ecref.scalar_mult(42))
    assert native.verify_h160(keys, target) == [False, True, False]
    target_u = hashref.pubkey_to_hash160(ecref.scalar_mult(43), compressed=False)
    assert native.verify_h160(keys, target_u, compressed=False) == [False, False, True]
