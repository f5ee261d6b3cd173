import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ptgnn_tpu.ops.pallas import segment_kernels as sk
from ptgnn_tpu.ops import segment_sum, segment_max

def timeit(fn, *args, n=20):
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
jr = jnp.asarray(recv); jm = jnp.asarray(mask)

t0 = time.time()
plan = sk.build_aggregation_plan(recv, mask, N, rows_per_block=256, agg_tile=512,
    num_tiles=sk.plan_num_tiles(E, N, 256, 512))
print(f"plan build (host): {(time.time()-t0)*1000:.1f} ms, tiles={plan.local_rows.shape}", file=sys.stderr)
plan = jax.tree_util.tree_map(jnp.asarray, plan)

f_sum = jax.jit(lambda d: sk.planned_segment_reduce(d, jr, plan, N, "sum", jm))
f_max = jax.jit(lambda d: sk.planned_segment_reduce(d, jr, plan, N, "max", jm))
f_sum_ref = jax.jit(lambda d: segment_sum(d, jr, N, jm))
f_max_ref = jax.jit(lambda d: segment_max(d, jr, N, jm))

# correctness on-device
np.testing.assert_allclose(np.asarray(f_sum(data)), np.asarray(f_sum_ref(data)), rtol=1e-4, atol=1e-4)
np.testing.assert_allclose(np.asarray(f_max(data)), np.asarray(f_max_ref(data)), rtol=1e-4, atol=1e-4)
print("device correctness OK", file=sys.stderr)

print(f"pallas sum: {timeit(f_sum, data):.3f} ms   (xla: {timeit(f_sum_ref, data):.3f} ms)")
print(f"pallas max: {timeit(f_max, data):.3f} ms   (xla: {timeit(f_max_ref, data):.3f} ms)")

g_sum = jax.jit(jax.grad(lambda d: f_sum(d).sum()))
g_max = jax.jit(jax.grad(lambda d: f_max(d).sum()))
g_sum_ref = jax.jit(jax.grad(lambda d: f_sum_ref(d).sum()))
g_max_ref = jax.jit(jax.grad(lambda d: f_max_ref(d).sum()))
np.testing.assert_allclose(np.asarray(g_max(data)), np.asarray(g_max_ref(data)), rtol=1e-4, atol=1e-4)
print(f"pallas sum grad: {timeit(g_sum, data):.3f} ms (xla: {timeit(g_sum_ref, data):.3f} ms)")
print(f"pallas max grad: {timeit(g_max, data):.3f} ms (xla: {timeit(g_max_ref, data):.3f} ms)")
