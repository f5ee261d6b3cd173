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
E = 458752
for D in (64, 128, 256):
    data = jnp.asarray(rng.randn(E, D).astype(np.float32))
    mb = E*D*4/1e6
    f_xla = jax.jit(lambda d: d + 1.0)
    t = timeit(f_xla, data)
    print(f"XLA copy [E,{D}] ({mb:.0f}MB logical): {t:.3f} ms -> {2*mb/t:.0f} GB/s", flush=True)

    TILE = 2048
    NT = E // TILE
    def k(d_ref, o_ref):
        o_ref[:] = jnp.sum(d_ref[:], axis=0, keepdims=True) + jnp.zeros((8, D), jnp.float32)
    f_pl = jax.jit(lambda d: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((NT*8, D), jnp.float32),
        grid=(NT,),
        in_specs=[pl.BlockSpec((TILE, D), lambda t: (t, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, D), lambda t: (t, 0), memory_space=pltpu.VMEM))(d))
    t = timeit(f_pl, data)
    print(f"Pallas read-reduce [E,{D}]: {t:.3f} ms -> {mb/t:.0f} GB/s read", flush=True)
