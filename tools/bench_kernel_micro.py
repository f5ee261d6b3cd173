import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(fn, *args, n=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time()-t0)/n*1000

rng = np.random.RandomState(0)
N, E, D = 32768, 458752, 64   # E = padded slots
R, TILE = 256, 512
NT = E // TILE
NB = N // R
data = jnp.asarray(rng.randn(E, D).astype(np.float32))
rows = rng.randint(0, R, E).astype(np.int32)
rows_row = jnp.asarray(np.repeat(rows.reshape(NT, TILE), 8, axis=0).reshape(NT*8, TILE))
trb = jnp.asarray(np.sort(rng.randint(0, NB, NT)).astype(np.int32))

def make(kernel, out_rows):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NT,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D), lambda t, rb: (rb[t], 0), memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda d: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((out_rows, D), jnp.float32),
        grid_spec=grid_spec)(trb, rows_row, d))

def k_copyonly(trb_ref, rr_ref, d_ref, o_ref):
    o_ref[:] = jnp.sum(d_ref[:], axis=0, keepdims=True) + jnp.zeros((R, D), jnp.float32)

def k_sum(precision):
    def k(trb_ref, rr_ref, d_ref, o_ref):
        t = pl.program_id(0)
        prev = trb_ref[jnp.maximum(t-1, 0)]
        is_start = jnp.logical_or(t == 0, trb_ref[t] != prev)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) == rr_ref[0:1, :]).astype(d_ref.dtype)
        contrib = jax.lax.dot_general(onehot, d_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32, precision=precision)
        @pl.when(is_start)
        def _(): o_ref[:] = contrib
        @pl.when(jnp.logical_not(is_start))
        def _(): o_ref[:] = o_ref[:] + contrib
    return k

print(f"reduce-only (no scatter): {timeit(make(k_copyonly, N), data):.3f} ms")
print(f"sum HIGHEST: {timeit(make(k_sum(jax.lax.Precision.HIGHEST), N), data):.3f} ms")
print(f"sum DEFAULT: {timeit(make(k_sum(jax.lax.Precision.DEFAULT), N), data):.3f} ms")
data16 = data.astype(jnp.bfloat16)
def make16(kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NT,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D), lambda t, rb: (rb[t], 0), memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda d: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        grid_spec=grid_spec)(trb, rows_row, d))
print(f"sum bf16 DEFAULT: {timeit(make16(k_sum(jax.lax.Precision.DEFAULT)), data16):.3f} ms")
