import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ptgnn_tpu.ops.pallas import segment_kernels as sk

rng = np.random.RandomState(0)
N, E, D = 32768, 262144, 64
recv = rng.randint(0, N, E).astype(np.int32)
mask = np.ones(E, bool)
jr = jnp.asarray(recv)
x0 = jnp.asarray(rng.randn(E, D).astype(np.float32))

def timeit_chained(fn, x0, n=100):
    x = fn(x0); float(x.ravel()[0])
    t0 = time.time()
    x = x0
    for _ in range(n):
        x = fn(x)
    float(x.ravel()[0])
    return (time.time() - t0) / n * 1000

for R, TILE in [(256, 512), (256, 1024), (256, 2048), (128, 2048), (512, 1024), (1024, 2048)]:
    try:
        plan = jax.tree_util.tree_map(jnp.asarray, sk.build_aggregation_plan(
            recv, mask, N, R, TILE, num_tiles=sk.plan_num_tiles(E, N, R, TILE)))
        nt = plan.tile_row_blocks.shape[0]
        f = jax.jit(lambda x, p=plan: jnp.take(
            sk.planned_segment_sum(x, jr, p, N), jr % np.int32(N), axis=0))
        t = timeit_chained(f, x0)
        print(f"R={R} TILE={TILE} steps={nt}: {t:.3f} ms (incl 1.0ms expand)", flush=True)
    except Exception as e:
        print(f"R={R} TILE={TILE}: FAIL {str(e)[:90]}", flush=True)
