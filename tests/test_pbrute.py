"""Fused brute pipeline (curve/pbrute.py): host-side logic tests.

The kernels themselves are mul-heavy Pallas code that only runs at speed
on real TPU hardware (scripts/check_pbrute.py is the on-device bit-exact
gate, run every round); here we test everything around them: engine
gating, target-word packing, index algebra, and summary decoding.
"""

import numpy as np
import pytest

from keyhuntm1cpu_tpu.curve import pbrute
from keyhuntm1cpu_tpu.engine.brute import BruteEngine, BruteParams
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import TargetSet


def _targets(keys, mode="rmd160"):
    mk = {
        "rmd160": lambda pt: hashref.pubkey_to_hash160(pt, compressed=True),
        "xpoint": lambda pt: pt[0].to_bytes(32, "big"),
    }[mode]
    kind = {"rmd160": "hash160", "xpoint": "xpoint"}[mode]
    raw = [mk(ecref.scalar_mult(k)) for k in keys]
    return TargetSet(kind=kind, raw=raw, labels=[str(k) for k in keys])


def test_pack_intervals():
    lo = [0x1122334455667788, 0xAABBCCDDEEFF0011]
    hi = [0x1122334455667788, 0xAABBCCDDEEFF0022]
    out = pbrute.pack_intervals(lo, hi)
    assert out.shape == (4, 8)
    assert out[0, 0] == 0x11223344 and out[1, 0] == 0x55667788
    assert out[2, 1] == 0xAABBCCDD and out[3, 1] == 0xEEFF0022
    # padding repeats entry 0
    assert out[0, 7] == 0x11223344 and out[3, 7] == 0x55667788
    assert pbrute.pack_intervals(list(range(9)), list(range(9))).shape == (4, 16)


def test_auto_gate_off_on_cpu():
    ts = _targets([1, 2, 3])
    eng = BruteEngine(ts, 1, 1 << 20, mode="rmd160",
                      params=BruteParams(block_u=256, steps_per_chunk=4,
                                         pallas="auto"))
    assert not eng._fast  # auto never picks the kernel path on CPU


def test_on_gate_validates_shapes():
    ts = _targets([1, 2, 3])
    with pytest.raises(ValueError):
        BruteEngine(ts, 1, 1 << 20, mode="rmd160",
                    params=BruteParams(block_u=100, pallas="on"))


def _fast_engine(keys=(1, 2, 3), mode="rmd160", a=1, b=1 << 16, **kw):
    params = BruteParams(block_u=256, steps_per_chunk=4, pallas_sb=4,
                         pallas="on", chunk_cand=64, **kw)
    return BruteEngine(_targets(list(keys), mode), a, b, mode=mode, params=params)


def test_fast_index_algebra_and_prefix_shift():
    eng = _fast_engine()
    # a=1, stride=1: base(0) = 0 -> lattice shifts one stride, key 1
    # becomes a host-verified prefix key
    assert eng._fast_prefix == [1]
    assert eng._fast_a == 2
    assert eng._fast_key(0) == 2
    assert eng._fast_key(255) == 257
    eng2 = _fast_engine(a=100)
    assert eng2._fast_prefix == [] and eng2._fast_key(0) == 100


def test_fast_base_point():
    eng = _fast_engine(a=100)
    px, py = eng._fast_base(0)
    want = ecref.scalar_mult(99)  # a - stride
    import keyhuntm1cpu_tpu.field.fe as fe

    assert list(np.asarray(px)) == list(fe.int_to_limbs(want[0]))
    assert list(np.asarray(py)) == list(fe.int_to_limbs(want[1]))


def _mk_summary(C, K, U, hits=(), degs=(), adv=(), ncand=None):
    """hits: (flat_pos, qbits); degs: (step, u0, n); adv: step indices."""
    arr = np.zeros(2 * C + 3 * K + 1, dtype=np.int32)
    arr[:C] = K * U
    for i, (pos, bits) in enumerate(hits):
        arr[i] = pos
        arr[C + i] = np.int32(np.uint32(bits))
    for s, u0, n in degs:
        arr[2 * C + s] = n
        arr[2 * C + K + s] = u0
    for s in adv:
        arr[2 * C + 2 * K + s] = 1
    arr[2 * C + 3 * K] = len(hits) if ncand is None else ncand
    return arr


def test_decode_fast_hit():
    eng = _fast_engine(keys=[300], a=100)
    C, K, U = eng.p.chunk_cand, eng.p.steps_per_chunk, eng.p.block_u
    # key 300 = a + j*stride -> j = 200; step 0, u0 = 200
    arr = _mk_summary(C, K, U, hits=[(200, 0b01)])
    k_eff, found = eng._decode_fast(0, arr)
    assert k_eff == K
    assert [f.private_key for f in found] == [300]


def test_decode_fast_hit_second_parity_bit():
    # parity bit 1 (odd prefix) maps to the same key candidate: the host
    # verifies +-k exactly, so either bit recovers it
    eng = _fast_engine(keys=[300], a=100)
    C, K, U = eng.p.chunk_cand, eng.p.steps_per_chunk, eng.p.block_u
    arr = _mk_summary(C, K, U, hits=[(200, 0b10)])
    _, found = eng._decode_fast(0, arr)
    assert [f.private_key for f in found] == [300]


def test_decode_fast_endo_bits():
    lam = ecref.LAMBDA
    key = 321
    want = key * lam % ecref.N
    eng = _fast_engine(keys=[want], a=100, endo=True)
    C, K, U = eng.p.chunk_cand, eng.p.steps_per_chunk, eng.p.block_u
    # walk covers key=321 at j=221; endo variant e=1 -> qset bits 2/3
    arr = _mk_summary(C, K, U, hits=[(221, 0b0100)])
    _, found = eng._decode_fast(0, arr)
    assert [f.private_key for f in found] == [want]


def test_decode_fast_degenerate_lane():
    eng = _fast_engine(keys=[105], a=100)
    C, K, U = eng.p.chunk_cand, eng.p.steps_per_chunk, eng.p.block_u
    # degenerate lane at step 0, u0 = 5 -> key 105 verified exactly
    arr = _mk_summary(C, K, U, degs=[(0, 5, 1)])
    k_eff, found = eng._decode_fast(0, arr)
    assert [f.private_key for f in found] == [105]


def test_decode_fast_adv_degeneracy_truncates():
    eng = _fast_engine(a=100)
    C, K, U = eng.p.chunk_cand, eng.p.steps_per_chunk, eng.p.block_u
    arr = _mk_summary(C, K, U, adv=[1])
    k_eff, _ = eng._decode_fast(0, arr)
    assert k_eff == 2  # steps 0..1 valid, rest to be re-walked


def test_decode_fast_overflow_rescans(monkeypatch):
    eng = _fast_engine(keys=[300], a=100)
    C, K, U = eng.p.chunk_cand, eng.p.steps_per_chunk, eng.p.block_u
    calls = []
    monkeypatch.setattr(
        eng, "_host_rescan_fast",
        lambda s0, k: calls.append((s0, k)) or [],
    )
    arr = _mk_summary(C, K, U, ncand=C + 1)
    eng._decode_fast(3, arr)
    assert calls == [(3, K)]


def test_host_rescan_fast_finds_keys():
    eng = _fast_engine(keys=[150, 260], a=100)
    found = eng._host_rescan_fast(0, 1)  # j in [0, 256) = keys 100..355
    got = sorted(f.private_key for f in found)
    assert got == [150, 260]


def test_host_rescan_fast_xpoint_endo():
    lam = ecref.LAMBDA
    want = 123 * lam % ecref.N
    eng = _fast_engine(keys=[want], mode="xpoint", a=100, endo=True)
    found = eng._host_rescan_fast(0, 1)
    assert want in [f.private_key for f in found]


def test_intervals_with_pallas_off_raise():
    from keyhuntm1cpu_tpu.engine.vanity import vanity_intervals

    ts = _targets([1, 2])
    ivs = vanity_intervals("1Q")
    with pytest.raises(ValueError, match="kernel path"):
        BruteEngine(ts, 1, 1 << 20, mode="rmd160",
                    params=BruteParams(pallas="off"), intervals=ivs)


def test_on_gate_rejects_sb_not_dividing_8():
    ts = _targets([1, 2])
    with pytest.raises(ValueError):
        BruteEngine(ts, 1, 1 << 20, mode="rmd160",
                    params=BruteParams(block_u=384, steps_per_chunk=6,
                                       pallas_sb=3, pallas="on"))


def test_pack_buckets_routing_and_padding():
    # values chosen to share lane 5: low 7 bits == 5
    v1 = (0xAAAA0000 << 32) | 0x85  # lane 5
    v2 = (0xBBBB0000 << 32) | 0x105  # lane 5 (bit 8 ignored by & 127)
    v3 = (0xCCCC0000 << 32) | 0x07  # lane 7
    out = pbrute.pack_buckets([v1, v2, v3])
    assert out.shape == (8, 128)
    assert out[0, 5] == 0xAAAA0000 and out[1, 5] == 0xBBBB0000
    # padding repeats the bucket's first entry
    assert out[2, 5] == 0xAAAA0000 and out[7, 5] == 0xAAAA0000
    assert out[0, 7] == 0xCCCC0000 and out[3, 7] == 0xCCCC0000
    # empty buckets stay zero
    assert out[0, 9] == 0
    # Lmax rounds up to a multiple of 8
    big = pbrute.pack_buckets([5 + ((i + 1) << 32) for i in range(11)])
    assert big.shape == (16, 128)
    assert sorted(big[:11, 5]) == list(range(1, 12))


def test_bucketed_gate_and_packing():
    # 600 exact targets > compare_max=512: the kernel path stays on via
    # lane buckets; intervals (none) become one impossible SMEM interval
    keys = list(range(1, 601))
    eng = _fast_engine(keys=keys, a=100)
    assert eng._fast and eng._bucketed
    assert eng._n_bucket_rows == eng._btab.shape[0]
    assert eng._n_bucket_rows % 8 == 0
    tw = np.asarray(eng._tgt_words)
    # impossible interval: lo = (0,1), hi = (0,0) -> never contains
    assert tw[0, 0] == 0 and tw[1, 0] == 1
    assert tw[2, 0] == 0 and tw[3, 0] == 0
    # every target's high word is present in its bucket's lane column
    raw = eng.targets.raw
    btab = np.asarray(eng._btab)
    for r in raw[:16]:
        v = int.from_bytes(r[:8], "big")
        assert (v >> 32) & 0xFFFFFFFF in btab[:, v & 127]


def test_bucketed_gate_past_bucket_max_falls_back():
    ts = _targets([1, 2, 3])
    params = BruteParams(block_u=256, steps_per_chunk=4, pallas_sb=4,
                         pallas="on", compare_max=2, bucket_max=2)
    with pytest.raises(ValueError, match="bucketed"):
        BruteEngine(ts, 1, 1 << 16, mode="rmd160", params=params)


def test_bucketed_with_intervals_keeps_both():
    from keyhuntm1cpu_tpu.engine.vanity import vanity_intervals

    keys = list(range(1, 601))
    ivs = vanity_intervals("1Q")
    params = BruteParams(block_u=256, steps_per_chunk=4, pallas_sb=4,
                         pallas="on", chunk_cand=64)
    eng = BruteEngine(_targets(keys), 1, 1 << 16, mode="rmd160",
                      params=params, intervals=ivs)
    assert eng._bucketed
    tw = np.asarray(eng._tgt_words)
    lo = (int(tw[0, 0]) << 32) | int(tw[1, 0])
    hi = (int(tw[2, 0]) << 32) | int(tw[3, 0])
    assert lo == int.from_bytes(ivs[0][0][:8], "big")
    assert hi == int.from_bytes(ivs[0][1][:8], "big")


def test_bucketed_chunk_traces():
    # eval_shape the full bucketed chunk: catches shape/indexing bugs in
    # the kernel body without Mosaic lowering (CPU-viable; the on-device
    # bit-exact gate is scripts/check_pbrute.py buckets)
    import jax

    from keyhuntm1cpu_tpu.curve import pbrute as pb
    from keyhuntm1cpu_tpu.field import fe

    eng = _fast_engine(keys=list(range(1, 601)), a=100)
    pt = ecref.scalar_mult(99)
    px = np.asarray(fe.int_to_limbs(pt[0]), dtype=np.uint32)
    py = np.asarray(fe.int_to_limbs(pt[1]), dtype=np.uint32)
    shapes = jax.eval_shape(
        lambda ppx, ppy: pb.pallas_brute_chunk(
            ppx, ppy, eng._tab_x_lm, eng._tab_y_lm,
            eng._adv_x_f, eng._adv_y_f, eng._tgt_words, eng._btab,
            K=4, U=256, SB=4, C=64, mode="rmd160", n_endo=1,
            n_bucket_rows=eng._n_bucket_rows,
        ),
        px, py,
    )
    assert shapes[2].shape == (2 * 64 + 3 * 4 + 1,)


def test_on_gate_validates_hash_rows():
    ts = _targets([1, 2, 3])
    # not a multiple of 8
    with pytest.raises(ValueError):
        BruteEngine(ts, 1, 1 << 20, mode="rmd160",
                    params=BruteParams(block_u=1024, pallas="on",
                                       hash_rows=4))
    # does not divide U/128
    with pytest.raises(ValueError):
        BruteEngine(ts, 1, 1 << 20, mode="rmd160",
                    params=BruteParams(block_u=1024, pallas="on",
                                       hash_rows=48))
    # valid divisor passes the gate
    eng = BruteEngine(ts, 1, 1 << 20, mode="rmd160",
                      params=BruteParams(block_u=1024, pallas="on",
                                         hash_rows=8))
    assert eng._fast


def test_decode_fast_vanity_endo_interval_hit():
    # VERDICT r4 #6 (vanity endomorphism): an interval hit on an endo
    # qset must reconstruct lambda*k and survive the host prefix verify
    # (reference allows -e for vanity, keyhunt.cpp:5749).
    from keyhuntm1cpu_tpu.engine.vanity import vanity_intervals

    lam = ecref.LAMBDA
    want = 321 * lam % ecref.N
    addr = hashref.pubkey_to_address(ecref.scalar_mult(want), compressed=True)
    pref = addr[:6]
    params = BruteParams(block_u=256, steps_per_chunk=4, pallas_sb=4,
                         pallas="on", chunk_cand=64, endo=True)
    eng = BruteEngine(
        TargetSet(kind="hash160", raw=[], labels=[]), 100, 1 << 16,
        mode="rmd160", params=params,
        intervals=vanity_intervals(pref), prefixes=[pref],
    )
    assert eng._n_endo_fast == 3
    assert eng.stats.multiplier == 6  # 2 parities x 3 endo lanes
    C, K, U = eng.p.chunk_cand, eng.p.steps_per_chunk, eng.p.block_u
    # scan key 321 sits at j = 221; endo power e=1 -> qset 2 (even parity)
    arr = _mk_summary(C, K, U, hits=[(221, 0b0100)])
    _, found = eng._decode_fast(0, arr)
    assert [f.private_key for f in found] == [want]
    assert found[0].target.startswith(pref)
