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
N, E, D = 32768, 458752, 64

for R, TILE in [(256, 512), (256, 1024), (256, 2048), (512, 2048), (256, 4096), (512, 4096)]:
    NT = E // TILE
    NB = N // R
    data = jnp.asarray(rng.randn(E, D).astype(np.float32))
    rows = rng.randint(0, R, E).astype(np.int32)
    rows_row = jnp.asarray(np.repeat(rows.reshape(NT, TILE), 8, axis=0).reshape(NT*8, TILE))
    trb = jnp.asarray(np.sort(rng.randint(0, NB, NT)).astype(np.int32))

    def k_sum(trb_ref, rr_ref, d_ref, o_ref):
        t = pl.program_id(0)
        prev = trb_ref[jnp.maximum(t-1, 0)]
        is_start = jnp.logical_or(t == 0, trb_ref[t] != prev)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) == rr_ref[0:1, :]).astype(d_ref.dtype)
        contrib = jax.lax.dot_general(onehot, d_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)
        @pl.when(is_start)
        def _(): o_ref[:] = contrib
        @pl.when(jnp.logical_not(is_start))
        def _(): o_ref[:] = o_ref[:] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NT,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D), lambda t, rb: (rb[t], 0), memory_space=pltpu.VMEM),
    )
    try:
        f = jax.jit(lambda d, gs=grid_spec, k=k_sum: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32), grid_spec=gs)(trb, rows_row, d))
        print(f"R={R} TILE={TILE} steps={NT}: {timeit(f, data):.3f} ms", flush=True)
    except Exception as e:
        print(f"R={R} TILE={TILE}: FAILED {str(e)[:80]}", flush=True)
