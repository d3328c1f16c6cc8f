"""Host-resolve BSGS: native table builder, HostTable, cascade without a
device exact table, engine end-to-end (XLA path; the pallas path runs in
the device gates, scripts/gate_host_resolve.py)."""

import numpy as np
import pytest

from keyhuntm1cpu_tpu.engine.bsgs import BSGSEngine, BSGSParams
from keyhuntm1cpu_tpu.filter import bitmap as bmp
from keyhuntm1cpu_tpu.filter import host_table as ht
from keyhuntm1cpu_tpu.ref import ecref

import jax.numpy as jnp


@pytest.fixture(scope="module")
def table_4k(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("tc"))
    return ht.ensure_host_table(1 << 12, cache_dir=cache), cache


def test_native_builder_bit_exact(table_4k):
    table, _ = table_4k
    m = table.m
    ref = np.array(
        [ecref.scalar_mult(j)[0] & ((1 << 64) - 1) for j in range(1, m + 1)],
        dtype=np.uint64,
    )
    order = np.argsort(ref, kind="stable")
    assert np.array_equal(np.asarray(table.keys), ref[order])
    assert np.array_equal(
        np.asarray(table.idx).astype(np.int64), order.astype(np.int64)
    )


def test_native_keys_range_matches_ecref():
    got = ht.native_keys_range(97, 5)
    ref = [ecref.scalar_mult(j)[0] & ((1 << 64) - 1) for j in range(97, 102)]
    assert got.tolist() == ref


def test_resolve_surfaces_every_match(table_4k):
    table, _ = table_4k
    js = [1, 2, 1000, 4096]
    keys = [ecref.scalar_mult(j)[0] & ((1 << 64) - 1) for j in js]
    qhi = np.array([k >> 32 for k in keys], dtype=np.uint32)
    qlo = np.array([k & 0xFFFFFFFF for k in keys], dtype=np.uint32)
    rows, got = table.resolve(qhi, qlo)
    assert rows.tolist() == [0, 1, 2, 3]
    assert got.tolist() == js
    rows, got = table.resolve(
        np.array([123], dtype=np.uint32), np.array([456], dtype=np.uint32)
    )
    assert len(rows) == 0


def test_cached_load_and_corruption_detect(table_4k, tmp_path):
    _, cache = table_4k
    t = ht.load_host_table(1 << 12, cache_dir=cache)
    assert t is not None and t.m == 1 << 12
    assert ht.load_host_table(1 << 11, cache_dir=cache) is None  # other m
    # truncate the keys plane -> size check rejects it
    import os, shutil

    bad = tmp_path / "bad"
    shutil.copytree(cache, bad)
    kp = bad / "baby_4096.keys"
    with open(kp, "r+b") as f:
        f.truncate(100)
    assert ht.load_host_table(1 << 12, cache_dir=str(bad)) is None


def test_filtered_survivors_matches_lookup_semantics(table_4k):
    table, _ = table_4k
    keys = np.asarray(table.keys)
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bm = bmp.build_bitmap(hi, lo, 20, on_device=False)
    b2 = bmp.build_bloom2_host(hi, lo, 18)
    rng = np.random.default_rng(3)
    qhi = np.concatenate([hi[:64], rng.integers(0, 2**32, 192).astype(np.uint32)])
    qlo = np.concatenate([lo[:64], rng.integers(0, 2**32, 192).astype(np.uint32)])
    fs = bmp.filtered_survivors(
        bm, jnp.asarray(qhi), jnp.asarray(qlo), 128, bm2=b2, stage1_max=256
    )
    pos = np.asarray(fs.pos)
    got_hi = np.asarray(fs.qhi)
    got_lo = np.asarray(fs.qlo)
    live = pos < 256
    # every real key must survive the cascade (no false negatives) and
    # carry its own planes
    surv = set(pos[live].tolist())
    assert set(range(64)) <= surv
    for i in np.nonzero(live)[0]:
        assert got_hi[i] == qhi[pos[i]] and got_lo[i] == qlo[pos[i]]


def test_engine_host_resolve_recovers_key(table_4k):
    table, cache = table_4k
    k = 0xABC123
    pub = ecref.scalar_mult(k)
    params = BSGSParams(
        m=1 << 12, block_u=16, steps_per_chunk=4, resolve="host",
        table_cache=cache, cascade2="on",
    )
    eng = BSGSEngine([pub], 0xA00000, 0xB00000, params, host_table=table)
    assert eng.table is None  # the HBM diet: no device exact table
    assert eng._summary_kind == "steps_host"
    found = eng.search()
    assert [f.private_key for f in found] == [k]


def test_engine_host_resolve_multitarget(table_4k):
    table, cache = table_4k
    ks = [0xA12345, 0xA54321, 0xAFEDCB]
    pubs = [ecref.scalar_mult(k) for k in ks]
    params = BSGSParams(
        m=1 << 12, block_u=16, steps_per_chunk=4, resolve="host",
        table_cache=cache,
    )
    eng = BSGSEngine(pubs, 0xA00000, 0xB00000, params, host_table=table)
    found = eng.search(stop_on_first=False)
    assert sorted(f.private_key for f in found) == sorted(ks)


def test_engine_host_resolve_scheduled_resume(table_4k, tmp_path):
    table, cache = table_4k
    from keyhuntm1cpu_tpu.core.checkpoint import CheckpointManager

    k = 0xBF1234  # in the LAST chunk (chunk = K*U*stride = 512Ki keys)
    pub = ecref.scalar_mult(k)
    params = BSGSParams(
        m=1 << 12, block_u=16, steps_per_chunk=4, resolve="host",
        table_cache=cache,
    )
    ck = CheckpointManager(str(tmp_path / "ck.json"), every_s=0)
    eng = BSGSEngine([pub], 0xA00000, 0xC00000, params, host_table=table)
    found = eng.search_scheduled(policy="sequential", checkpoint=ck,
                                 max_chunks=1, stop_on_first=False)
    assert found == []
    eng2 = BSGSEngine([pub], 0xA00000, 0xC00000, params, host_table=table)
    found = eng2.search_scheduled(policy="sequential", checkpoint=ck,
                                  stop_on_first=False)
    assert [f.private_key for f in found] == [k]


def test_host_rescan_exactness(table_4k):
    """Force the overflow fallback path: a cascade budget of 0 is not
    reachable, so call _host_rescan_step directly on the step that
    contains the key."""
    table, cache = table_4k
    k = 0xABC123
    pub = ecref.scalar_mult(k)
    params = BSGSParams(
        m=1 << 12, block_u=16, steps_per_chunk=4, resolve="host",
        table_cache=cache,
    )
    eng = BSGSEngine([pub], 0xA00000, 0xB00000, params, host_table=table)
    stride = eng.stride
    step = (k - 0xA00000) // (16 * stride)
    found = []
    for s in (step - 1, step, step + 1):
        if 0 <= s < eng.n_steps:
            found += eng._host_rescan_step(s)
    assert k in [f.private_key for f in found]
