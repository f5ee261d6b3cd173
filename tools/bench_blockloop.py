import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ptgnn_tpu.ops.pallas import segment_kernels as sk

rng = np.random.RandomState(0)
N, E, D = 32768, 262144, 64
recv = rng.randint(0, N, E).astype(np.int32)
mask = np.ones(E, bool)
plan = jax.tree_util.tree_map(jnp.asarray, sk.build_aggregation_plan(recv, mask, N, 256, 512,
    num_tiles=sk.plan_num_tiles(E, N, 256, 512)))
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

from ptgnn_tpu.ops import segment_sum
# correctness on device
out_bl = sk._run_kernel_blockloop(plan, x0)[:N]
ref = segment_sum(x0, jr, N, jnp.asarray(mask))
print("device allclose:", bool(jnp.allclose(out_bl, ref, atol=1e-4)), flush=True)

f_bl = jax.jit(lambda x: jnp.take(sk._run_kernel_blockloop(plan, x)[:N], jr % np.int32(N), axis=0))
print(f"blockloop sum + expand: {timeit_chained(f_bl, x0):.3f} ms", flush=True)
f_rv = jax.jit(lambda x: jnp.take(sk._run_kernel(sk._sum_kernel, plan, x)[:N], jr % np.int32(N), axis=0))
print(f"revisit  sum + expand: {timeit_chained(f_rv, x0):.3f} ms", flush=True)
# bf16
x16 = x0.astype(jnp.bfloat16)
f_bl16 = jax.jit(lambda x: jnp.take(sk._run_kernel_blockloop(plan, x)[:N].astype(jnp.bfloat16), jr % np.int32(N), axis=0))
print(f"blockloop sum bf16 + expand: {timeit_chained(f_bl16, x16):.3f} ms", flush=True)
