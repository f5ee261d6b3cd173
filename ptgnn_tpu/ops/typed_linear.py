"""Per-edge-type linear maps as one tile-batched MXU matmul.

The reference loops over edge types in Python, gathering each type's source
states and applying that type's Linear (gatedmessagepassing.py:50-61,
mlpmessagepassing.py:82-98). With the type-blocked edge layout (every tile of
``edge_tile`` consecutive edges shares one type, see graph/structs.py) the
whole thing collapses to a single einsum over [num_tiles, tile, D] x
[num_tiles, D, M] — one large batched matmul the MXU eats whole, independent
of how many edge types exist.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def typed_tile_matmul(
    x: jax.Array,
    weight_stack: jax.Array,
    tile_types: jax.Array,
    edge_tile: int,
) -> jax.Array:
    """x: [E, D]; weight_stack: [T, D, M]; tile_types: [E // edge_tile].

    Returns [E, M] where row e is x[e] @ weight_stack[type(e)].
    E must be a multiple of edge_tile and each tile must be type-pure
    (guaranteed by the batcher).
    """
    e, d = x.shape
    assert e % edge_tile == 0, (e, edge_tile)
    m = weight_stack.shape[-1]
    xt = x.reshape(e // edge_tile, edge_tile, d)
    wt = jnp.take(weight_stack, tile_types, axis=0)  # [nt, D, M]
    y = jax.lax.dot_general(
        xt,
        wt.astype(x.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        # f32 accumulation for low-precision inputs; keep f64 when the caller
        # computes in f64 (the fp64 reference-parity suites).
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    )
    return y.reshape(e, m).astype(x.dtype)


def typed_tile_bias_add(
    y: jax.Array, bias_stack: jax.Array, tile_types: jax.Array, edge_tile: int
) -> jax.Array:
    """Add per-type biases: y [E, M] += bias_stack[type(e)] ([T, M])."""
    e, m = y.shape
    bt = jnp.take(bias_stack, tile_types, axis=0)  # [nt, M]
    return (y.reshape(e // edge_tile, edge_tile, m) + bt[:, None, :].astype(y.dtype)).reshape(e, m)
