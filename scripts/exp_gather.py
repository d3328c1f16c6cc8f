"""Experiment: does Mosaic lower dynamic gathers inside a TPU kernel?

Tries (a) jnp.take_along_axis along lanes, (b) along sublanes,
(c) full-table row lookup via one-hot matmul-free select.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_one(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


# (a) take_along_axis along the lane dim: tbl (8,128), idx (8,128) in [0,128)
def k_lane(tbl_ref, idx_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(tbl_ref[:, :], idx_ref[:, :], axis=1)


def lane_gather():
    tbl = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = (tbl * 7 + 3) % 128
    return pl.pallas_call(
        k_lane,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(tbl, idx)


# (b) gather along sublanes of a (512,128) table with per-lane row indices
def k_sub(tbl_ref, idx_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(
        tbl_ref[:, :], idx_ref[:, :] % 512, axis=0
    )


def sub_gather():
    tbl = jnp.arange(512 * 128, dtype=jnp.int32).reshape(512, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 37 + 5) % 512
    return pl.pallas_call(
        k_sub,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(tbl, idx)


# (c) big-table lane gather: (8, 4096) table, gather along axis=1
def k_lane_big(tbl_ref, idx_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(tbl_ref[:, :], idx_ref[:, :], axis=1)


def lane_big():
    tbl = jnp.arange(8 * 4096, dtype=jnp.int32).reshape(8, 4096)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 997 + 11) % 4096
    return pl.pallas_call(
        k_lane_big,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(tbl, idx)


if __name__ == "__main__":
    print(jax.devices())
    ok_a = try_one("lane take_along_axis (8,128)", lane_gather)
    ok_b = try_one("sublane take_along_axis (512,128)", sub_gather)
    ok_c = try_one("lane take_along_axis big (8,4096)", lane_big)
    # correctness check for whichever passed
    if ok_a:
        tbl = np.arange(8 * 128, dtype=np.int32).reshape(8, 128)
        idx = (tbl * 7 + 3) % 128
        want = np.take_along_axis(tbl, idx, axis=1)
        got = np.asarray(lane_gather())
        print("lane correct:", np.array_equal(want, got))
    if ok_b:
        tbl = np.arange(512 * 128, dtype=np.int32).reshape(512, 128)
        idx = ((np.arange(8 * 128, dtype=np.int32).reshape(8, 128)) * 37 + 5) % 512
        want = np.take_along_axis(tbl, idx, axis=0)
        got = np.asarray(sub_gather())
        print("sublane correct:", np.array_equal(want, got))
