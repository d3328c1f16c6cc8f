"""Multi-device sharded BSGS on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from keyhuntm1cpu_tpu.engine import BSGSParams
from keyhuntm1cpu_tpu.parallel import RangePartitioner, ShardedBSGSEngine
from keyhuntm1cpu_tpu.ref import ecref

PARAMS = BSGSParams(m=512, block_u=16, steps_per_chunk=2, build_block=128, chain_len=8)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_partitioner_alignment():
    window = 1024
    slices = RangePartitioner.split_equal(1000, 1000 + 10 * window + 5, 4, window)
    assert len(slices) == 4
    # window-aligned starts, contiguous global step indexing
    for s in slices:
        assert (s.start - 1000) % window == 0
        assert s.step0 == (s.start - 1000) // window
    assert slices[0].step0 == 0
    assert slices[-1].end == 1000 + 10 * window + 5


def test_partitioner_more_shards_than_windows():
    slices = RangePartitioner.split_equal(0x1000, 0x1000 + 10, 8, 1 << 20)
    assert len(slices) == 8  # degenerate shards repeat the last window


@pytest.fixture(scope="module")
def table():
    pub = ecref.scalar_mult(12345)
    from keyhuntm1cpu_tpu.engine import BSGSEngine

    return BSGSEngine([pub], 1, 2, PARAMS).table


@pytest.mark.parametrize("key_pos", ["low", "mid", "high"])
def test_sharded_recovery(table, key_pos):
    a = 0x500000
    b = a + 2**20  # 64 windows over 8 devices = 8 local steps each
    key = {"low": a + 123, "mid": a + 2**19 + 777, "high": b - 55}[key_pos]
    eng = ShardedBSGSEngine(
        [ecref.scalar_mult(key)], a, b, PARAMS, table=table
    )
    found = eng.search_sharded(stop_on_first=False)
    assert key in [f.private_key for f in found]


def test_sharded_matches_single_device(table):
    """Sharded and single-device engines must find the same key."""
    from keyhuntm1cpu_tpu.engine import BSGSEngine

    a, b = 0x700000, 0x700000 + 2**19
    key = a + 0x6789A
    pub = ecref.scalar_mult(key)
    single = BSGSEngine([pub], a, b, PARAMS, table=table).search()
    sharded = ShardedBSGSEngine([pub], a, b, PARAMS, table=table).search_sharded()
    assert [f.private_key for f in single] == [key]
    assert key in [f.private_key for f in sharded]


@pytest.mark.parametrize("key_pos", ["low", "high"])
def test_sharded_table_recovery(table, key_pos):
    """Table+bitmap sharded across devices: queries all_gathered, each
    device probes its own slice, union of per-prober summaries is exact."""
    from keyhuntm1cpu_tpu.parallel import ShardedTableBSGSEngine

    a = 0x500000
    b = a + 2**20
    key = {"low": a + 123, "high": b - 55}[key_pos]
    eng = ShardedTableBSGSEngine(
        [ecref.scalar_mult(key)], a, b, PARAMS, table=table
    )
    # every device holds only 1/8th of the table
    assert eng.tbl_hi.shape == (8, -(-512 // 8))
    found = eng.search_sharded(stop_on_first=False)
    assert key in [f.private_key for f in found]


def test_sharded_table_matches_replicated(table):
    from keyhuntm1cpu_tpu.engine import BSGSEngine
    from keyhuntm1cpu_tpu.parallel import ShardedTableBSGSEngine

    a, b = 0x700000, 0x700000 + 2**19
    key = a + 0x6789A
    pub = ecref.scalar_mult(key)
    single = BSGSEngine([pub], a, b, PARAMS, table=table).search()
    sharded = ShardedTableBSGSEngine(
        [pub], a, b, PARAMS, table=table
    ).search_sharded()
    assert [f.private_key for f in single] == [key]
    assert key in [f.private_key for f in sharded]


def test_sharded_table_refuses_single_device_search(table):
    from keyhuntm1cpu_tpu.parallel import ShardedTableBSGSEngine

    eng = ShardedTableBSGSEngine(
        [ecref.scalar_mult(123)], 0x500000, 0x500000 + 2**20, PARAMS,
        table=table,
    )
    with pytest.raises(NotImplementedError):
        eng.search()
    with pytest.raises(NotImplementedError):
        eng.search_scheduled()


def test_sharded_deadline_stops(table):
    """max_seconds=0 on the mesh path returns promptly and cleanly."""
    a = 0x500000
    eng = ShardedBSGSEngine(
        [ecref.scalar_mult(a + 123)], a, a + 2**20, PARAMS, table=table
    )
    assert eng.search_sharded(stop_on_first=False, max_seconds=0.0) == []
    found = eng.search_sharded(stop_on_first=False, max_seconds=120.0)
    assert a + 123 in [f.private_key for f in found]
