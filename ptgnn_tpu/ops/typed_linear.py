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

import functools
import os

import jax
import jax.numpy as jnp


def _use_pallas_typed_matmul(x, weight_stack, edge_tile: int) -> bool:
    """Wide-D/small-T configs (PPI: Din=512, M=256, T=2) route through the
    Pallas kernel below: the XLA route materializes a [n_tiles, D, M]
    gathered weight stack in HBM (240 MB/call at PPI shapes — 4.5 ms/step
    of gathers in the round-5 profile), while the kernel selects each
    tile's weight BLOCK via the prefetched tile types, so the type-sorted
    stream fetches each type's weights once. Gated to shapes where the
    gather actually hurts; override: PTGNN_TPU_TYPED_MM_PALLAS=0/1."""
    override = os.environ.get("PTGNN_TPU_TYPED_MM_PALLAS")
    if override is not None:
        return override not in ("0", "false", "")
    if jax.default_backend() != "tpu":
        return False
    # bf16 only: the kernel's dot and XLA's batched dot then run the same
    # single MXU pass. For f32 operands XLA's default-precision dot uses
    # bf16 passes while the kernel's f32 dot does not — measured a ~9%
    # step regression on varmisuse's qualifying f32 call when f32 routed.
    if x.dtype != jnp.bfloat16:
        return False
    t, d, m = weight_stack.shape
    if d % 128 or m % 128 or edge_tile % 8:
        return False
    n_tiles = x.shape[0] // edge_tile
    # Both conditions measured on the v5e (round-5 A/B): the kernel wins
    # 29.7 -> 25.4 ms/step on PPI (256 KB weight blocks, 240 MB gathered
    # stack) but LOSES ~9% on graph2seq/varmisuse (32-64 KB blocks — the
    # XLA gather is cheap there and fusion with neighbors is worth more).
    return (
        d * m * x.dtype.itemsize >= 128 * 1024
        and n_tiles * d * m * x.dtype.itemsize >= 32 * 1024 * 1024
    )


def _pallas_typed_matmul_impl(x, weight_stack, tile_types, edge_tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, d = x.shape
    m = weight_stack.shape[-1]
    nt = e // edge_tile
    w = weight_stack.astype(x.dtype)

    def kernel(tt_ref, x_ref, w_ref, o_ref):
        del tt_ref  # consumed by the index maps
        o_ref[:] = jax.lax.dot_general(
            x_ref[:],
            w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # tile_types
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (edge_tile, d), lambda i, tt: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, d, m), lambda i, tt: (tt[i], 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (edge_tile, m), lambda i, tt: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((e, m), x.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * e * d * m,
            bytes_accessed=(e * (d + m) + weight_stack.shape[0] * d * m)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_types, x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_typed_matmul(x, weight_stack, tile_types, edge_tile: int):
    return _pallas_typed_matmul_impl(x, weight_stack, tile_types, edge_tile)


def _pallas_typed_matmul_fwd(x, weight_stack, tile_types, edge_tile: int):
    y = _pallas_typed_matmul_impl(x, weight_stack, tile_types, edge_tile)
    return y, (x, weight_stack, tile_types)


def _pallas_typed_matmul_bwd(edge_tile: int, res, dy):
    x, weight_stack, tile_types = res
    # dx rides the same kernel against the transposed stack; dW uses the
    # per-type masked full-E dots (this route only fires at small-T/wide-D,
    # exactly where the masked route wins the traffic comparison — see
    # ops/fused_mp.py's dW routing note).
    w_t = jnp.swapaxes(weight_stack, 1, 2)  # [T, M, D]
    dx = _pallas_typed_matmul_impl(
        dy.astype(x.dtype), w_t, tile_types, edge_tile
    )
    tt_e = jnp.repeat(tile_types, edge_tile)
    d_w = jnp.stack(
        [
            jax.lax.dot_general(
                x,
                dy * (tt_e == t).astype(dy.dtype)[:, None],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for t in range(weight_stack.shape[0])
        ]
    ).astype(weight_stack.dtype)
    return dx, d_w, None


_pallas_typed_matmul.defvjp(_pallas_typed_matmul_fwd, _pallas_typed_matmul_bwd)


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
    if _use_pallas_typed_matmul(x, weight_stack, edge_tile):
        return _pallas_typed_matmul(x, weight_stack, tile_types, edge_tile)
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
