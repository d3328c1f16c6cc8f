"""Reference .blm/.tbl interop: XXH64 vectors, round-trip, EC spot-check."""

import numpy as np
import pytest

from keyhuntm1cpu_tpu.utils import legacy
from keyhuntm1cpu_tpu.ref import ecref


def test_xxh64_32byte_vectors():
    """Expected values generated with the canonical XXH64 (the library the
    reference vendors) for 32-byte messages."""
    m1 = np.array([(i * 7 + 3) & 0xFF for i in range(32)], dtype=np.uint8)
    m2 = np.full(32, 0xAB, dtype=np.uint8)
    got = legacy.xxh64_32bytes(m1[None, :], 0x59F2815B16F81798)[0]
    assert int(got) == 18418651583189093914
    got = legacy.xxh64_32bytes(m1[None, :], 0)[0]
    assert int(got) == 2577116162849570199
    got = legacy.xxh64_32bytes(m2[None, :], 12345)[0]
    assert int(got) == 5202772646636968155


def test_xxh64_chained_seed_batch():
    msgs = np.arange(3 * 32, dtype=np.uint64).astype(np.uint8).reshape(3, 32)
    a = legacy.xxh64_32bytes(msgs, legacy.BLOOM_SEED)
    b = legacy.xxh64_32bytes(msgs, a)  # per-lane seeds (double hashing)
    for i in range(3):
        assert int(b[i]) == int(
            legacy.xxh64_32bytes(msgs[i][None, :], int(a[i]))[0]
        )


def test_export_read_roundtrip_and_ec_verify(tmp_path):
    m = 1024
    paths = legacy.export_reference_files(str(tmp_path), m)
    assert len(paths) == 4
    m2, m3 = legacy.derived_sizes(m)
    assert (m2, m3) == (32, 1)
    # structural re-read with checksum verification
    blooms = legacy.read_blm(str(tmp_path / f"keyhunt_bsgs_4_{m}.blm"))
    assert len(blooms) == 256
    assert all(b.entries == 1000 for b in blooms)  # small-m floor
    value, index = legacy.read_tbl(str(tmp_path / f"keyhunt_bsgs_2_{m3}.tbl"))
    assert len(value) == m3
    # contents match exact EC math
    assert legacy.verify_against_ecref(str(tmp_path), m)


def test_read_blm_detects_corruption(tmp_path):
    m = 1024
    legacy.export_reference_files(str(tmp_path), m)
    p = tmp_path / f"keyhunt_bsgs_4_{m}.blm"
    data = bytearray(p.read_bytes())
    data[legacy.BLOOM_STRUCT + 5] ^= 0xFF  # flip a bit-array byte
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="checksum"):
        legacy.read_blm(str(p))
    legacy.read_blm(str(p), skip_checksum=True)  # reference -6 analog


def test_bloom_membership_semantics(tmp_path):
    """Planted X values probe positive; absent ones (overwhelmingly)
    probe negative at fp 1e-6."""
    bl = legacy.LegacyBloom.create(1000)
    xs = legacy.baby_x_bytes(64)
    bl.add(xs)
    assert bl.check(xs).all()
    other = np.frombuffer(
        ecref.scalar_mult(999999)[0].to_bytes(32, "big"), dtype=np.uint8
    )[None, :]
    assert not bl.check(other)[0]


def test_general_xxh64_canonical_vectors():
    from keyhuntm1cpu_tpu.utils.xxhash import xxh64

    msg = bytes((i * 13 + 1) & 0xFF for i in range(100))
    vectors = [
        (0, 5285565135405403709),
        (1, 7203755045532983444),
        (3, 16098822197020239217),
        (7, 12730200234637966193),
        (8, 12390309947818504701),
        (15, 11497292928896814913),
        (31, 7449453051459588252),
        (32, 3871888702456516128),
        (33, 4698048105263599758),
        (64, 4411820148583485689),
        (100, 7272568505423433165),
    ]
    for n, want in vectors:
        assert xxh64(msg[:n], 0x9747B28C) == want, n
    assert xxh64(msg, 0) == 3268152388800753960
    # agrees with the vectorized specializations
    from keyhuntm1cpu_tpu.filter.bloom import xxh64_u64
    import numpy as np

    v = 0x1122334455667788
    assert xxh64(v.to_bytes(8, "little"), 7) == int(
        xxh64_u64(np.array([v], dtype=np.uint64), 7)[0]
    )
    x32 = np.frombuffer(msg[:32], dtype=np.uint8)[None, :]
    assert xxh64(msg[:32], 9) == int(legacy.xxh64_32bytes(x32, 9)[0])
