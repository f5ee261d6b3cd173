import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ptgnn_tpu.ops.pallas import segment_kernels as sk
from ptgnn_tpu.ops import segment_sum

rng = np.random.RandomState(0)
N, E, D = 32768, 262144, 64
recv = rng.randint(0, N, E).astype(np.int32)
mask = np.ones(E, bool)
plan = jax.tree_util.tree_map(jnp.asarray, sk.build_aggregation_plan(recv, mask, N, 256, 512,
    num_tiles=sk.plan_num_tiles(E, N, 256, 512)))
jr = jnp.asarray(recv)
x0 = jnp.asarray(rng.randn(E, D).astype(np.float32))
f = jax.jit(lambda x: jnp.take(sk.planned_segment_sum(x, jr, plan, N), jr % np.int32(N), axis=0))
t0=time.time()
y = f(x0); v = float(y.ravel()[0])
print(f"resident sum compile+1: {time.time()-t0:.1f}s", flush=True)
# correctness
out = sk.planned_segment_sum(x0, jr, plan, N)
ref = segment_sum(x0, jr, N, jnp.asarray(mask))
print("allclose:", bool(jnp.allclose(out, ref, atol=1e-4)), flush=True)
t0=time.time()
x = x0
for _ in range(100):
    x = f(x)
float(x.ravel()[0])
print(f"resident sum+expand: {(time.time()-t0)/100*1000:.3f} ms", flush=True)
