import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ptgnn_tpu.ops.pallas import segment_kernels as sk

def timeit(fn, *args, n=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time()-t0)/n*1000

print("backend:", jax.default_backend(), file=sys.stderr)
rng = np.random.RandomState(0)
N, E, D = 32768, 393216, 64
recv = rng.randint(0, N, E).astype(np.int32)
mask = np.ones(E, bool)
data = jnp.asarray(rng.randn(E, D).astype(np.float32))
jr = jnp.asarray(recv)

for R, tile in [(256, 512), (512, 512), (512, 1024), (128, 512), (256, 1024)]:
    plan = sk.build_aggregation_plan(recv, mask, N, rows_per_block=R, agg_tile=tile,
        num_tiles=sk.plan_num_tiles(E, N, R, tile))
    plan_j = jax.tree_util.tree_map(jnp.asarray, plan)
    e_sorted = plan_j.local_rows.shape[0]
    data_sorted = jnp.asarray(rng.randn(e_sorted, D).astype(np.float32))
    f_kernel = jax.jit(lambda d, p=plan_j: sk._run_kernel(sk._sum_kernel, p, d))
    f_gather = jax.jit(lambda d, p=plan_j: jnp.take(d, p.perm, axis=0, mode="fill", fill_value=0.0) + 1.0)
    f_full = jax.jit(lambda d, p=plan_j: sk.planned_segment_sum(d, jr, p, N))
    sys.stdout.flush(); print(f"R={R} tile={tile} ntiles={e_sorted//tile}: kernel={timeit(f_kernel, data_sorted):.3f}ms "
          f"gather={timeit(f_gather, data):.3f}ms full={timeit(f_full, data):.3f}ms", flush=True)
