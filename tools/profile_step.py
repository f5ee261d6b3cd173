"""Decompose the Graph2Class train step on TPU with the unified layout."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp

def timeit(fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time()-t0)/n*1000

from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.harness import build_graph2class

max_nodes = 32768
padding = BatchPadding(
    max_nodes=max_nodes, max_edge_slots=max_nodes*12, max_graphs=32,
    edge_tile=128, agg_rows=256,
    reference_budgets=(("supernodes", 2048), ("token-sequence", max_nodes)),
)
model, module, params, mbs = build_graph2class(
    padding=padding, num_metadata_graphs=40, mean_nodes=2500, max_graph_nodes=8000,
    hidden_state_size=64, num_minibatches=1, minibatch_size=300)
mb = jax.device_put(mbs[0])
print("nodes", int(mb["batch"].num_nodes), "edges", int(mb["batch"].num_edges), file=sys.stderr)

batch = mb["batch"]
gnn = module.gnn
from ptgnn_tpu.graph.messagepassing.base import GraphContext
ctx = GraphContext(adjacency=batch.adjacency, edge_features=None,
    node_graph=batch.node_graph, node_mask=batch.node_mask,
    graph_mask=batch.graph_mask, references=batch.references)

# node embedder
f_emb = jax.jit(lambda p: gnn.node_embedder.apply(p["node_embedder"], **batch.node_data))
print(f"embedder fwd: {timeit(f_emb, params['gnn']):.2f} ms")
states = f_emb(params["gnn"])

# one MP layer fwd / bwd
layer = gnn.message_passing_layers[1]
lp = params["gnn"]["mp_layers"][1]
f_l = jax.jit(lambda p, s: layer.apply(p, s, ctx))
print(f"MP layer fwd: {timeit(f_l, lp, states):.2f} ms")
f_lg = jax.jit(lambda p, s: jax.grad(lambda pp, ss: layer.apply(pp, ss, ctx).sum(), argnums=(0,1))(p, s))
print(f"MP layer fwd+bwd(grads): {timeit(f_lg, lp, states):.2f} ms")

# full module fwd
f_fwd = jax.jit(lambda p: module.apply(p, **mb, train=False)[0])
print(f"module fwd: {timeit(f_fwd, params):.2f} ms")
# full loss+grad
f_g = jax.jit(lambda p: jax.value_and_grad(lambda pp: module.apply(pp, **mb, train=True, rng=jax.random.PRNGKey(0))[0])(p))
print(f"module fwd+bwd: {timeit(f_g, params):.2f} ms")

# amp variant
def _cast(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype) if hasattr(x,'dtype') and jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
f_g_amp = jax.jit(lambda p: jax.value_and_grad(lambda pp: module.apply(_cast(pp, jnp.bfloat16), **_cast(mb, jnp.bfloat16), train=True, rng=jax.random.PRNGKey(0))[0].astype(jnp.float32))(p))
print(f"module fwd+bwd AMP: {timeit(f_g_amp, params):.2f} ms")
