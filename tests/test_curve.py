"""Curve ops vs the exact golden reference (keys 1..32 and random points).

Mirrors the reference's de-facto acceptance fixtures (tests/1to32.* are
the addresses/hashes of private keys 1..32; SURVEY.md §4) as first-class
automated tests.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from keyhuntm1cpu_tpu.curve import points, tables, walk
from keyhuntm1cpu_tpu.field import fe
from keyhuntm1cpu_tpu.ref import ecref

random.seed(99)


def test_add_general_cases():
    ks = [1, 2, 3, 5, 100, ecref.N - 1]
    pa = [ecref.scalar_mult(k) for k in ks] + [None, ecref.G, None]
    pb = [ecref.scalar_mult(k + 7) for k in ks] + [ecref.G, None, None]
    # doubling and P + (-P)
    pa += [ecref.scalar_mult(9), ecref.scalar_mult(9)]
    pb += [ecref.scalar_mult(9), ecref.point_neg(ecref.scalar_mult(9))]
    A = points.point_batch_from_ints(pa)
    B = points.point_batch_from_ints(pb)
    got = points.point_batch_to_ints(points.add(A, B, chain_len=4))
    exp = [ecref.point_add(x, y) for x, y in zip(pa, pb)]
    assert got == exp


def test_scalar_mult_keys_1_to_32():
    gx, gy = tables.gtable_np()
    scalars = list(range(1, 33))
    got = points.point_batch_to_ints(
        points.scalar_mult_batch(
            fe.from_ints(scalars), jnp.asarray(gx), jnp.asarray(gy), chain_len=8
        )
    )
    exp = [ecref.scalar_mult(k) for k in scalars]
    assert got == exp


def test_scalar_mult_large_keys():
    gx, gy = tables.gtable_np()
    scalars = [
        0x7CCE5EFDACCF6808,  # puzzle 63 solution
        0x1A838B13505B26867,  # puzzle 65 solution
        random.randrange(1, ecref.N),
        ecref.N - 1,
    ]
    got = points.point_batch_to_ints(
        points.scalar_mult_batch(
            fe.from_ints(scalars), jnp.asarray(gx), jnp.asarray(gy), chain_len=4
        )
    )
    assert got == [ecref.scalar_mult(k) for k in scalars]


def test_xonly_walk_symmetric():
    U = 16
    tb_x, tb_y = tables.step_table(ecref.G, U)
    cs = [1000, 5]  # 5 exercises the degenerate (center == u*S) lane
    Cb = points.point_batch_from_ints([ecref.scalar_mult(c) for c in cs])
    res = walk.xonly_walk(
        Cb, jnp.asarray(tb_x), jnp.asarray(tb_y), symmetric=True, chain_len=8
    )
    deg = np.asarray(res.degenerate)
    for t, c in enumerate(cs):
        xp = fe.to_ints(res.x_plus[t])
        xm = fe.to_ints(res.x_minus[t])
        for u in range(1, U + 1):
            if deg[t, u - 1]:
                continue  # flagged lane: host would verify candidate c = +-u
            assert xp[u - 1] == ecref.scalar_mult(c + u)[0], (t, u)
            if c != u:
                assert xm[u - 1] == ecref.scalar_mult(c - u)[0], (t, u)
    assert deg[1, 4], "center==5G vs u=5 must be flagged"
    assert not deg[0].any()


def test_walk_advance():
    Cb = points.point_batch_from_ints([ecref.scalar_mult(77)])
    S = points.point_batch_from_ints([ecref.scalar_mult(100)])
    out = points.point_batch_to_ints(walk.advance(Cb, S, chain_len=1))
    assert out == [ecref.scalar_mult(177)]


def test_walk_nonsymmetric():
    U = 8
    tb_x, tb_y = tables.step_table(ecref.G, U)
    Cb = points.point_batch_from_ints([ecref.scalar_mult(50)])
    res = walk.xonly_walk(Cb, jnp.asarray(tb_x), jnp.asarray(tb_y), symmetric=False)
    assert res.x_minus is None
    xp = fe.to_ints(res.x_plus[0])
    for u in range(1, U + 1):
        assert xp[u - 1] == ecref.scalar_mult(50 + u)[0]


def test_pladder_mxu_gather_matches_indexing():
    """curve/pladder.py one-hot int8 MXU gather == gx[byte] exactly for
    every window (the EXACTNESS of the centered-int8 dot is the whole
    trick; the ladder kernel itself is device-gated by
    scripts/check_pladder.py — XLA:CPU takes 2m50s to compile even ONE
    fe_tiles mixed add, so no CPU twin)."""
    import jax.numpy as jnp

    from keyhuntm1cpu_tpu.curve import pladder, tables

    gx, gy = tables.gtable_np()
    rng = np.random.default_rng(3)
    kv = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
    qx, qy, qinf = pladder._gather_windows(
        jnp.asarray(kv), jnp.asarray(gx), jnp.asarray(gy)
    )
    qx, qy, qinf = np.asarray(qx), np.asarray(qy), np.asarray(qinf)
    for w in range(32):
        byte = (kv[:, w // 4] >> (8 * (w % 4))) & 0xFF
        assert np.array_equal(qx[w], gx[w][byte]), f"window {w} x"
        assert np.array_equal(qy[w], gy[w][byte]), f"window {w} y"
        assert np.array_equal(qinf[w], byte == 0)


def test_pladder_slab_layout_mapping():
    """The window-major slab layout must route (window w, batch i) to
    sublane w*BR + (i row offset) of grid block i//(BR*128) — the
    kernel reads qx_ref[:, w*BR : (w+1)*BR, :] per window."""
    import jax.numpy as jnp

    LANES = 128
    nb, br = 3, 8
    n = nb * br * LANES
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, (32, n, 8), dtype=np.uint32)

    v = jnp.asarray(a).reshape(32, nb, br, LANES, 8)
    slab = np.asarray(
        jnp.transpose(v, (4, 1, 0, 2, 3)).reshape(8, nb * 32 * br, LANES)
    )
    for r in (0, 2):
        for w in (0, 17, 31):
            for j in (0, 7):
                for lane in (0, 127):
                    batch = (r * br + j) * LANES + lane
                    got = slab[:, r * (32 * br) + w * br + j, lane]
                    assert np.array_equal(got, a[w, batch]), (r, w, j)
