"""Kernel timing with tunnel-safe methodology: long chained loops, float sync."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ptgnn_tpu.ops.pallas import segment_kernels as sk
from ptgnn_tpu.ops import segment_sum, segment_max

def timeit_chained(fn, x0, n=150):
    """Chain outputs->inputs so steps can't overlap; sync via float."""
    x = fn(x0)
    float(x.ravel()[0])
    t0 = time.time()
    x = x0
    for _ in range(n):
        x = fn(x)
    float(x.ravel()[0])
    return (time.time() - t0) / n * 1000

rng = np.random.RandomState(0)
N, E, D = 32768, 262144, 64
recv = rng.randint(0, N, E).astype(np.int32)
mask = np.ones(E, bool)
plan = sk.build_aggregation_plan(recv, mask, N, 256, 512,
    num_tiles=sk.plan_num_tiles(E, N, 256, 512))
plan = jax.tree_util.tree_map(jnp.asarray, plan)
jr, jm = jnp.asarray(recv), jnp.asarray(mask)
x0 = jnp.asarray(rng.randn(E, D).astype(np.float32))

# out [N,D] -> expand back to [E,D] via gather so the loop chains
expander = jax.jit(lambda out: jnp.take(out, jr % N, axis=0))

def chain(agg_fn):
    @jax.jit
    def f(x):
        out = agg_fn(x)
        return jnp.take(out, jr % np.int32(N), axis=0)
    return f

f_pallas_sum = chain(lambda x: sk.planned_segment_sum(x, jr, plan, N))
f_xla_sum = chain(lambda x: segment_sum(x, jr, N, jm))
f_pallas_max = chain(lambda x: sk.planned_segment_reduce(x, jr, plan, N, "max", jm))
f_xla_max = chain(lambda x: segment_max(x, jr, N, jm))
f_gather_only = jax.jit(lambda x: jnp.take(x[:N], jr % np.int32(N), axis=0))
f_matmul = jax.jit(lambda x: (x.reshape(E//512, 512, D) @ jnp.eye(D)).reshape(E, D))

print(f"gather-expand only [N->E]: {timeit_chained(f_gather_only, x0):.3f} ms", flush=True)
print(f"pallas sum + expand: {timeit_chained(f_pallas_sum, x0):.3f} ms", flush=True)
print(f"xla sum + expand: {timeit_chained(f_xla_sum, x0):.3f} ms", flush=True)
print(f"pallas max + expand: {timeit_chained(f_pallas_max, x0):.3f} ms", flush=True)
print(f"xla max + expand: {timeit_chained(f_xla_max, x0):.3f} ms", flush=True)
print(f"tiled matmul identity [E,D]: {timeit_chained(f_matmul, x0):.3f} ms", flush=True)
