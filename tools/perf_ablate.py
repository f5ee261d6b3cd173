"""Layer-count ablation with tunnel-safe timing (float() sync, long runs)."""
import sys, time, os
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp
import optax
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
from ptgnn_tpu.graph.embedders import StrElementRepresentationModel
from ptgnn_tpu.graph.messagepassing import MlpMessagePassingLayer
from ptgnn_tpu.implementations.typilus.graph2class import Graph2Class
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

def build(n_layers, agg="max", fused="1"):
    os.environ["PTGNN_TPU_FORCE_PALLAS_AGG"] = fused
    max_nodes = 32768
    padding = BatchPadding(
        max_nodes=max_nodes, max_edge_slots=max_nodes*8, max_graphs=32,
        edge_tile=128, agg_rows=256,
        reference_budgets=(("supernodes", 2048), ("token-sequence", max_nodes)),
    )
    def creator(num_edges):
        return [MlpMessagePassingLayer(
            input_state_dimension=64, output_state_dimension=64, message_dimension=64,
            num_edge_types=num_edges, message_aggregation_function=agg, dropout_rate=0.1,
        ) for _ in range(n_layers)]
    model = Graph2Class(gnn_model=GraphNeuralNetworkModel(
        node_representation_model=StrElementRepresentationModel(
            embedding_size=64, token_splitting="subtoken", subtoken_combination="mean",
            vocabulary_size=10000, min_freq_threshold=5, dropout_rate=0.1),
        message_passing_layer_creator=creator, padding=padding,
        introduce_backwards_edges=True, add_self_edges=True,
        stop_extending_minibatch_after_num_nodes=max_nodes))
    data = lambda: synthetic_typilus_graphs(40, seed=0, mean_nodes=2500, max_nodes=8000)
    model.compute_metadata(data(), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    mbs = [mb for mb,_ in model.minibatch_iterator(
        model.tensorize_dataset(data(), parallelize=False), max_minibatch_size=300, parallelize=False)]
    return module, params, jax.device_put(mbs[0]), int(mbs[0]["batch"].num_edges)

def measure(tag, n_layers, agg="max", fused="1", steps=40):
    module, params, mb, edges = build(n_layers, agg, fused)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2.5e-4))
    opt_state = optimizer.init(params)
    def _cast(tree, dtype):
        return jax.tree_util.tree_map(lambda x: x.astype(dtype) if hasattr(x,'dtype') and jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
    def train_step(params, opt_state, mb, rng):
        def lf(p):
            loss, m = module.apply(_cast(p, jnp.bfloat16), **_cast(mb, jnp.bfloat16), train=True, rng=rng)
            return loss.astype(jnp.float32)
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = optimizer.update(_cast(grads, jnp.float32), opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss
    step = jax.jit(train_step, donate_argnums=(0,1))
    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(0))
    float(loss)
    compile_s = time.time()-t0
    # warm queue then time long run; float(loss) forces completion
    t0 = time.time()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(i))
    lv = float(loss)
    dt = (time.time()-t0)/steps
    print(f"[{tag}] layers={n_layers} agg={agg} fused={fused}: compile {compile_s:.0f}s, "
          f"{dt*1000:.1f} ms/step, {edges/dt/1e3:.0f}k edges/s (loss {lv:.3f})", flush=True)

measure("L1-sum-fused", 1, agg="sum")
measure("L1-max-fused", 1)
measure("L4-max-fused", 4)
measure("L12-max-fused", 12)
measure("L4-max-nofused", 4, fused="0")
measure("L12-max-nofused", 12, fused="0")
