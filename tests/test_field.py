"""Field arithmetic vs exact python-int ground truth.

Replaces the reference's missing unit coverage for secp256k1/IntMod.cpp
(SURVEY.md §4: "zero unit tests for the EC math") with random-vector and
edge-case property tests.
"""

import random

import jax
import numpy as np
import pytest

from keyhuntm1cpu_tpu.field import fe

P = fe.P_INT
random.seed(1234)

EDGE = [1, 2, 3, P - 1, P - 2, (P - 1) // 2, 0x1000003D0, 2**255, 2**128, 2**32 - 1]
RAND = [random.randrange(1, P) for _ in range(54)]
VALS = EDGE + RAND
REV = list(reversed(VALS))


@pytest.fixture(scope="module")
def ab():
    return fe.from_ints(VALS), fe.from_ints(REV)


def test_roundtrip(ab):
    a, _ = ab
    assert fe.to_ints(a) == VALS


def test_add(ab):
    a, b = ab
    assert fe.to_ints(fe.add_mod_p(a, b)) == [(x + y) % P for x, y in zip(VALS, REV)]


def test_sub(ab):
    a, b = ab
    assert fe.to_ints(fe.sub_mod_p(a, b)) == [(x - y) % P for x, y in zip(VALS, REV)]


def test_neg_and_zero(ab):
    a, _ = ab
    assert fe.to_ints(fe.neg_mod_p(a)) == [(-x) % P for x in VALS]
    z = fe.from_ints([0])
    assert fe.to_ints(fe.neg_mod_p(z)) == [0]
    assert bool(fe.is_zero(z)[0])


def test_mul(ab):
    a, b = ab
    assert fe.to_ints(fe.mul_mod_p(a, b)) == [(x * y) % P for x, y in zip(VALS, REV)]


def test_mul_extremes():
    worst = [P - 1, P - 1, 0, 1, 2**256 % P]
    a = fe.from_ints(worst)
    assert fe.to_ints(fe.mul_mod_p(a, a)) == [(x * x) % P for x in worst]


def test_sqr(ab):
    a, _ = ab
    assert fe.to_ints(fe.sqr_mod_p(a)) == [(x * x) % P for x in VALS]


def test_inv(ab):
    a, _ = ab
    assert fe.to_ints(fe.inv_mod_p(a)) == [pow(x, -1, P) for x in VALS]


@pytest.mark.parametrize("chain_len", [1, 4, 32])
def test_batch_inv(ab, chain_len):
    a, _ = ab
    got = fe.to_ints(fe.batch_inv_mod_p(a, chain_len=chain_len))
    assert got == [pow(x, -1, P) for x in VALS]


def test_batch_inv_nonmultiple_batch():
    vals = RAND[:7]
    got = fe.to_ints(fe.batch_inv_mod_p(fe.from_ints(vals), chain_len=4))
    assert got == [pow(x, -1, P) for x in vals]


def test_sqrt(ab):
    qrs = [x * x % P for x in VALS]
    got = fe.to_ints(fe.sqrt_mod_p(fe.from_ints(qrs)))
    for g, q in zip(got, qrs):
        assert g * g % P == q


def test_batch_shape_2d():
    a = fe.from_ints(VALS[:16]).reshape(4, 4, 8)
    b = fe.from_ints(REV[:16]).reshape(4, 4, 8)
    got = fe.to_ints(fe.mul_mod_p(a, b))
    assert got == [(x * y) % P for x, y in zip(VALS[:16], REV[:16])]


def test_jit_consistency(ab):
    a, b = ab
    jitted = jax.jit(fe.mul_mod_p)
    assert fe.to_ints(jitted(a, b)) == fe.to_ints(fe.mul_mod_p(a, b))
