"""Pallas elementwise modular inverse (secp256k1 addition chain).

The XLA inversion ladder (fe.pow_mod_p) is a lax.scan whose ~380 serial
rounds each pay per-op overhead — it dominates every XLA-path engine step.
This kernel runs the same math as fe_tiles.inv (255 squarings + 15
multiplies, fori-compressed) as one straight-line kernel over limb-major
tiles. Used by fe.batch_inv_mod_p for the chain-total inversion; the rest
of the Montgomery trick stays in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fe_tiles as ft

LANES = 128
SUBLANES = 8


def _inv_kernel(a_ref, o_ref):
    o_ref[:, :, :] = ft.inv(a_ref[:, :, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def inv_batch(a: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(B, 8) uint32 batch-major -> elementwise a^(p-2) mod p, (B, 8).

    B is padded to a whole (8, 128) tile internally; maps 0 -> 0.
    """
    b = a.shape[0]
    tile = SUBLANES * LANES
    pad = (-b) % tile
    if pad:
        filler = jnp.zeros((pad, 8), dtype=jnp.uint32).at[:, 0].set(1)
        a = jnp.concatenate([a, filler], axis=0)
    rows = a.shape[0] // LANES
    lm = jnp.transpose(a, (1, 0)).reshape(8, rows, LANES)
    spec = pl.BlockSpec((8, SUBLANES, LANES), lambda g: (0, g, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _inv_kernel,
        out_shape=jax.ShapeDtypeStruct(lm.shape, jnp.uint32),
        grid=(rows // SUBLANES,),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(lm)
    out_bm = jnp.transpose(out.reshape(8, -1), (1, 0))
    return out_bm[:b]
