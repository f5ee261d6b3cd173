import sys, time, os
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp
import optax
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.harness import build_graph2class

def run(tag, force_env, steps=20):
    os.environ["PTGNN_TPU_FORCE_PALLAS_AGG"] = force_env
    max_nodes = 32768
    padding = BatchPadding(
        max_nodes=max_nodes, max_edge_slots=max_nodes*8, max_graphs=32,
        edge_tile=128, agg_rows=256,
        reference_budgets=(("supernodes", 2048), ("token-sequence", max_nodes)),
    )
    model, module, params, mbs = build_graph2class(
        padding=padding, num_metadata_graphs=40, mean_nodes=2500, max_graph_nodes=8000,
        hidden_state_size=64, num_minibatches=1, minibatch_size=300)
    mb = jax.device_put(mbs[0])
    edges = int(mbs[0]["batch"].num_edges)
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
    t0=time.time()
    params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    compile_s = time.time()-t0
    t0=time.time()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    dt = (time.time()-t0)/steps
    print(f"[{tag}] compile {compile_s:.1f}s, {dt*1000:.1f} ms/step, {edges/dt/1e3:.0f}k edges/s", flush=True)

run("fused", "1")
run("nofused", "0")
