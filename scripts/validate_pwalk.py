"""Validate the Pallas walk kernels on real TPU — bit-exact vs both the
XLA fused walk and pure python-int EC math.

Run: python scripts/validate_pwalk.py  (needs the TPU; CPU pytest covers
the underlying tile arithmetic in tests/test_fe_tiles.py — interpret-mode
execution of these kernels is pathologically slow, so kernel-level
validation lives here and in bench.py's puzzle-63 recovery gate.)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from keyhuntm1cpu_tpu.curve import points, pwalk, tables, walk
from keyhuntm1cpu_tpu.field import fe
from keyhuntm1cpu_tpu.ref import ecref

U = 1024
K = 16
SB = 4
STRIDE = 1 << 21


def xla_reference(tab_x_bm, tab_y_bm, adv, base):
    tab_x = jnp.asarray(tab_x_bm)
    tab_y = jnp.asarray(tab_y_bm)
    adv_x = fe.from_int(adv[0])
    adv_y = fe.from_int(adv[1])
    pb = points.point_batch_from_ints([base])
    cx, cy = pb.x, pb.y
    step = jax.jit(
        lambda cx, cy: walk.walk_fused(
            points.PointBatch(cx, cy, jnp.zeros((1,), bool)),
            tab_x, tab_y, adv_x, adv_y, chain_len=32,
        )
    )
    qhis, qlos, degs = [], [], []
    for _ in range(K):
        res = step(cx, cy)
        qhis.append(np.asarray(res.x_plus[0, :, 1]))
        qlos.append(np.asarray(res.x_plus[0, :, 0]))
        degs.append(np.asarray(res.degenerate[0]))
        cx, cy = res.adv_x, res.adv_y
    return (np.stack(qhis), np.stack(qlos), np.stack(degs),
            np.asarray(cx[0]), np.asarray(cy[0]))


def main():
    print("devices:", jax.devices())
    s_pt = ecref.point_neg(ecref.scalar_mult(STRIDE))
    tab_x_bm, tab_y_bm = tables.step_table(s_pt, U)
    adv = ecref.point_neg(ecref.scalar_mult(U * STRIDE))
    base = ecref.scalar_mult(0xDEADBEEF12345)

    t0 = time.time()
    want_qhi, want_qlo, want_deg, want_nx, want_ny = xla_reference(
        tab_x_bm, tab_y_bm, adv, base
    )
    print(f"xla reference done in {time.time()-t0:.1f}s")

    tab_x_lm = pwalk.table_to_limb_major(tab_x_bm)
    tab_y_lm = pwalk.table_to_limb_major(tab_y_bm)
    px = jnp.asarray(fe.int_to_limbs(base[0]))
    py = jnp.asarray(fe.int_to_limbs(base[1]))
    ax = jnp.asarray(fe.int_to_limbs(adv[0]))
    ay = jnp.asarray(fe.int_to_limbs(adv[1]))

    t0 = time.time()
    chunk = jax.jit(
        lambda px, py: pwalk.pallas_chunk(
            px, py, tab_x_lm, tab_y_lm, ax, ay, K=K, U=U, SB=SB
        )
    )
    res = chunk(px, py)
    jax.block_until_ready(res)
    print(f"pallas chunk compile+run {time.time()-t0:.1f}s")

    assert np.array_equal(np.asarray(res.qhi), want_qhi), "qhi mismatch"
    assert np.array_equal(np.asarray(res.qlo), want_qlo), "qlo mismatch"
    assert np.array_equal(np.asarray(res.degenerate), want_deg), "deg mismatch"
    assert np.array_equal(np.asarray(res.next_x), want_nx), "next_x mismatch"
    assert np.array_equal(np.asarray(res.next_y), want_ny), "next_y mismatch"
    assert not bool(np.asarray(res.adv_degenerate).any())
    print("pallas chunk == XLA fused walk (bit-exact)")

    # spot-check against pure python-int EC math
    qhi = np.asarray(res.qhi)
    qlo = np.asarray(res.qlo)
    rng = np.random.default_rng(0)
    for s, u in zip(rng.integers(0, K, 6), rng.integers(1, U + 1, 6)):
        adv_s = ecref.scalar_mult(int(s), adv) if s else None
        p_s = ecref.point_add(base, adv_s) if adv_s else base
        want_pt = ecref.point_add(
            p_s, ecref.point_neg(ecref.scalar_mult(int(u) * STRIDE))
        )
        want64 = want_pt[0] & ((1 << 64) - 1)
        got64 = (int(qhi[s, u - 1]) << 32) | int(qlo[s, u - 1])
        assert got64 == want64, (s, u)
    print("spot checks vs python-int EC math OK")

    # throughput probe
    n = 20
    t0 = time.time()
    r = res
    for _ in range(n):
        r = chunk(r.next_x, r.next_y)
    jax.block_until_ready(r)
    dt = time.time() - t0
    print(f"pallas walk: {n*K*U/dt:.3e} points/s (U={U}, K={K}, SB={SB})")


def validate_hash_and_inv():
    """Pallas hash160 + inversion kernels vs host/golden (real TPU)."""
    from keyhuntm1cpu_tpu.hash.phash import hash160_x2_from_batch
    from keyhuntm1cpu_tpu.field import pinv
    from keyhuntm1cpu_tpu.ref import hashref

    keys = list(range(1, 129))
    xs = [ecref.scalar_mult(k)[0] for k in keys]
    x_bm = jnp.asarray(np.stack([fe.int_to_limbs(x) for x in xs]))
    (le, he), (lo, ho) = hash160_x2_from_batch(x_bm)
    le, he, lo, ho = (np.asarray(v) for v in (le, he, lo, ho))
    for i, k in enumerate(keys):
        x = ecref.scalar_mult(k)[0]
        for odd, l, h in ((False, le, he), (True, lo, ho)):
            dig = hashref.hash160(bytes([3 if odd else 2]) + x.to_bytes(32, "big"))
            assert int(l[i]) == int.from_bytes(dig[0:4], "little"), (k, odd)
            assert int(h[i]) == int.from_bytes(dig[4:8], "little"), (k, odd)
    print("pallas hash160 x2 bit-exact vs host on keys 1..128")

    rng = np.random.default_rng(3)
    vals = [int.from_bytes(rng.bytes(32), "little") % fe.P_INT for _ in range(300)]
    a = jnp.asarray(np.stack([fe.int_to_limbs(v) for v in vals]))
    got = [fe.limbs_to_int(r) for r in np.asarray(pinv.inv_batch(a))]
    assert got == [pow(v, fe.P_INT - 2, fe.P_INT) for v in vals]
    print("pallas inversion bit-exact on 300 random elements")


def validate_multi_target_groups():
    """T > 128 multi-target walks (lane-width kernel-A groups): a 160-
    target engine search must recover the planted keys through the
    grouped pallas path on real hardware."""
    from keyhuntm1cpu_tpu.engine.bsgs import BSGSEngine, BSGSParams

    params = BSGSParams(m=1 << 14, block_u=1024, steps_per_chunk=8,
                        pallas="on")
    a, b = 1 << 24, (1 << 24) + (1 << 21)
    planted = [a + 12345, a + (1 << 20) + 777]
    decoys = [b + 999 + 17 * i for i in range(158)]
    pubs = [ecref.scalar_mult(k) for k in planted + decoys]
    eng = BSGSEngine(pubs, a, b, params)
    assert eng._use_pallas(), "160 targets must stay on the kernel path"
    found = sorted(f.private_key for f in eng.search(stop_on_first=False))
    assert found == sorted(planted), (found, planted)
    print(f"multi-target T=160 grouped kernel path: recovered {found}")


if __name__ == "__main__":
    main()
    validate_hash_and_inv()
    validate_multi_target_groups()
