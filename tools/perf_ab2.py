import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp
import optax
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.harness import build_graph2class

max_nodes = 32768
padding = BatchPadding(
    max_nodes=max_nodes, max_edge_slots=max_nodes*8, max_graphs=32,
    edge_tile=128, agg_rows=256,
    reference_budgets=(("supernodes", 2048), ("token-sequence", max_nodes)),
)
model, module, params, mbs = build_graph2class(
    padding=padding, num_metadata_graphs=60, mean_nodes=2500, max_graph_nodes=8000,
    hidden_state_size=64, num_minibatches=4, minibatch_size=300)
device_batches = [jax.device_put(m) for m in mbs]
optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2.5e-4))
opt_state = optimizer.init(params)
def _cast(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype) if hasattr(x,'dtype') and jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
def train_step(params, opt_state, mb, rng):
    def lf(p):
        loss, m = module.apply(_cast(p, jnp.bfloat16), **_cast(mb, jnp.bfloat16), train=True, rng=rng)
        return loss.astype(jnp.float32)
    loss, grads = jax.value_and_grad(lf)(params)
    grads = _cast(grads, jnp.float32)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss
step = jax.jit(train_step, donate_argnums=(0,1))
params, opt_state, loss = step(params, opt_state, device_batches[0], jax.random.PRNGKey(0))
jax.block_until_ready(loss)
print("compiled", flush=True)

def bench(tag, nb, steps=40):
    global params, opt_state
    t0=time.time()
    losses=[]
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, device_batches[i % nb], jax.random.PRNGKey(i))
        losses.append(loss)
    jax.block_until_ready(loss)
    dt=(time.time()-t0)/steps
    print(f"[{tag}] {dt*1000:.1f} ms/step  loss[-1]={float(loss):.4f} loss[0]={float(losses[0]):.4f}", flush=True)

bench("1batch", 1)
bench("2batch", 2)
bench("4batch", 4)
bench("1batch-again", 1)
