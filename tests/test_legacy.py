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


def test_oldbloom_roundtrip_and_migration(tmp_path):
    """A pre-2021 `_3_` file (176-byte oldbloom structs, embedded
    checksums) loads, migrates to v4 on disk like the reference does
    (keyhunt.cpp:1422-1476), and the migrated set still EC-verifies."""
    m = 1024
    # build a real level-1 bloom set, then rewrite it in the OLD layout
    legacy.export_reference_files(str(tmp_path), m)
    p4 = tmp_path / f"keyhunt_bsgs_4_{m}.blm"
    blooms = legacy.read_blm(str(p4))
    p3 = tmp_path / f"keyhunt_bsgs_3_{m}.blm"
    legacy.write_old_blm(str(p3), blooms)
    p4.unlink()

    # old-layout read is bit-identical
    old = legacy.read_old_blm(str(p3))
    assert all(
        (a.entries, a.bits, a.nbytes, a.hashes) ==
        (b.entries, b.bits, b.nbytes, b.hashes)
        and np.array_equal(a.bf, b.bf)
        for a, b in zip(old, blooms)
    )

    # level-1 loader falls back to _3_ and writes the v4 upgrade
    got, migrated = legacy.load_level1_blooms(str(tmp_path), m)
    assert migrated and p4.exists()
    again = legacy.read_blm(str(p4))  # checksum-verified v4 re-read
    assert all(np.array_equal(a.bf, b.bf) for a, b in zip(again, blooms))
    # second load now hits the v4 file directly
    _, migrated2 = legacy.load_level1_blooms(str(tmp_path), m)
    assert not migrated2
    # the migrated set answers membership like the original
    assert legacy.verify_against_ecref(str(tmp_path), m)


def test_oldbloom_detects_corruption(tmp_path):
    m = 1024
    legacy.export_reference_files(str(tmp_path), m)
    blooms = legacy.read_blm(str(tmp_path / f"keyhunt_bsgs_4_{m}.blm"))
    p3 = tmp_path / f"keyhunt_bsgs_3_{m}.blm"
    legacy.write_old_blm(str(p3), blooms)
    data = bytearray(p3.read_bytes())
    data[legacy.OLDBLOOM_STRUCT + 5] ^= 0xFF
    p3.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="checksum"):
        legacy.read_old_blm(str(p3))
    legacy.read_old_blm(str(p3), skip_checksum=True)


def test_dat_cache_roundtrip(tmp_path):
    """`data_<8-hex>.dat` write/read roundtrip: sorted 20-byte table,
    bloom answers membership on the raw hash160 bytes, checksums catch
    corruption (keyhunt.cpp:6131-6279 / 6578-6678 layout)."""
    rng = np.random.default_rng(7)
    values = rng.integers(0, 256, (300, 20), dtype=np.uint8)
    p = tmp_path / "data_cafebabe.dat"
    legacy.write_dat(str(p), values)
    bloom, table = legacy.read_dat(str(p))
    assert table.shape == (300, 20)
    # sorted ascending as raw bytes (the reference binary-searches it)
    as_tuples = [tuple(r) for r in table]
    assert as_tuples == sorted(as_tuples)
    assert set(as_tuples) == {tuple(r) for r in values}
    assert bloom.entries == 10000  # small-N floor
    assert bloom.check(values).all()
    absent = rng.integers(0, 256, (64, 20), dtype=np.uint8)
    mask = ~np.array([tuple(r) in set(as_tuples) for r in absent])
    assert not bloom.check(absent)[mask].any()

    data = bytearray(p.read_bytes())
    data[-3] ^= 0xFF  # corrupt the address table tail
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="checksum"):
        legacy.read_dat(str(p))
    legacy.read_dat(str(p), skip_checksum=True)


def test_dat_cache_path_prefix(tmp_path):
    """Filename prefix = hex of the FIRST 4 sha256 bytes of the target
    file (keyhunt.cpp:6146-6148 tohex_dst(checksum, 4))."""
    import hashlib

    f = tmp_path / "targets.txt"
    f.write_bytes(b"1LVqbj6eDeBBiG8CbwadNgeZoCDKs29eT7\n")
    want = hashlib.sha256(f.read_bytes()).digest()[:4].hex()
    p = legacy.dat_cache_path(str(f), str(tmp_path))
    assert p == str(tmp_path / f"data_{want}.dat")


def test_xxh64_20bytes_matches_scalar():
    from keyhuntm1cpu_tpu.utils.xxhash import xxh64

    rng = np.random.default_rng(3)
    msgs = rng.integers(0, 256, (32, 20), dtype=np.uint8)
    for seed in (0, legacy.BLOOM_SEED, 0xDEADBEEF):
        got = legacy.xxh64_20bytes(msgs, seed)
        for i in range(len(msgs)):
            assert int(got[i]) == xxh64(msgs[i].tobytes(), seed)
    # per-lane seeds (double hashing's second call)
    a = legacy.xxh64_20bytes(msgs, legacy.BLOOM_SEED)
    b = legacy.xxh64_20bytes(msgs, a)
    for i in range(len(msgs)):
        assert int(b[i]) == xxh64(msgs[i].tobytes(), int(a[i]))


def test_reference_dat_readthrough(tmp_path):
    """parse_target_file_cached prefers a reference-written data_*.dat
    sitting next to the target file; corrupt ones fall back to text."""
    from keyhuntm1cpu_tpu.utils import targets as tg

    f = tmp_path / "addrs.txt"
    h1 = bytes(range(20))
    h2 = bytes(range(100, 120))
    f.write_text(f"{h1.hex()}\n{h2.hex()}\n")
    ts = tg.parse_target_file(str(f), "rmd160")
    dat = tg.write_reference_dat(str(f), ts, str(tmp_path))
    assert dat == legacy.dat_cache_path(str(f), str(tmp_path))

    got = tg.parse_target_file_cached(str(f), "rmd160")
    assert got.kind == "hash160"
    assert set(got.raw) == {h1, h2}
    assert got.labels == [b.hex() for b in got.raw]

    # corrupting the .dat falls back to the text parse, not an error
    data = bytearray((tmp_path / dat.split("/")[-1]).read_bytes())
    data[-1] ^= 0xFF
    (tmp_path / dat.split("/")[-1]).write_bytes(bytes(data))
    got2 = tg.parse_target_file_cached(str(f), "rmd160")
    assert set(got2.raw) == {h1, h2}
