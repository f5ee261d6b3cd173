"""Breadth benchmark: train-step throughput for every task family on one
chip (tunnel-safe timing). Secondary to bench.py's headline metric."""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
import optax


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def measure(tag, module, params, mb, steps=30, amp=True):
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = opt.init(params)

    def train_step(params, opt_state, mb, rng):
        def lf(p):
            pp = _cast(p, jnp.bfloat16) if amp else p
            mm = _cast(mb, jnp.bfloat16) if amp else mb
            loss, _ = module.apply(pp, **mm, train=True, rng=rng)
            return loss.astype(jnp.float32)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(_cast(grads, jnp.float32), opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    mb = jax.device_put(mb)
    edges = int(mb["batch"].num_edges)
    graphs = int(mb["batch"].num_graphs)
    params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(0))
    float(loss)
    t0 = time.time()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(i))
    float(loss)
    dt = (time.time() - t0) / steps
    print(
        f"[{tag}] {dt*1000:.1f} ms/step, {edges/dt/1e3:.0f}k edges/s, "
        f"{graphs/dt:.1f} graphs/s",
        flush=True,
    )


def build_typilus():
    from ptgnn_tpu.implementations.typilus.harness import build_graph2class
    from ptgnn_tpu.implementations.typilus.train import default_padding

    # the stock CLI configuration: the task's DEFAULT padding
    _, module, params, mbs = build_graph2class(
        padding=default_padding(), num_metadata_graphs=20, mean_nodes=2500,
        max_graph_nodes=8000, num_minibatches=1, minibatch_size=300)
    return "typilus/graph2class", module, params, mbs[0]


def bench_typilus():
    measure(*build_typilus())


def build_ppi():
    from ptgnn_tpu.implementations.ppi.dataloader import PPIGraphSample
    from ptgnn_tpu.implementations.ppi.train import create_ppi_gnn_model
    from ptgnn_tpu.utils.synthetic import synthetic_ppi_graphs

    from ptgnn_tpu.implementations.ppi.train import ppi_padding

    model = create_ppi_gnn_model(hidden_state_size=256, padding=ppi_padding())
    raw = [
        PPIGraphSample([np.asarray(g["edges"], np.int32)], g["features"],
                       g["labels"].astype(bool))
        for g in synthetic_ppi_graphs(4, seed=0, mean_nodes=1200, edges_per_node=10)
    ]
    model.compute_metadata(iter(raw), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    mb = next(iter(model.minibatch_iterator(
        model.tensorize_dataset(iter(raw), parallelize=False),
        max_minibatch_size=4, parallelize=False)))[0]
    return "ppi", module, params, mb


def bench_ppi():
    measure(*build_ppi())


def build_varmisuse():
    from ptgnn_tpu.implementations.varmisuse.train import create_var_misuse_gnn_model, vm_padding
    from ptgnn_tpu.utils.synthetic import synthetic_varmisuse_samples

    model = create_var_misuse_gnn_model(padding=vm_padding())
    raw = list(synthetic_varmisuse_samples(48, seed=0, mean_tokens=250))
    model.compute_metadata(iter(raw), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    mb = next(iter(model.minibatch_iterator(
        model.tensorize_dataset(iter(raw), parallelize=False),
        max_minibatch_size=48, parallelize=False)))[0]
    return "varmisuse", module, params, mb


def bench_varmisuse():
    measure(*build_varmisuse())


def build_graph2seq():
    from ptgnn_tpu.implementations.graph2seq.train import create_graph2seq_model, g2s_padding
    from ptgnn_tpu.utils.synthetic import synthetic_graph2seq_samples

    model = create_graph2seq_model(padding=g2s_padding())
    raw = list(synthetic_graph2seq_samples(64, seed=0, mean_nodes=250, max_nodes=600))
    model.compute_metadata(iter(raw), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    mb = next(iter(model.minibatch_iterator(
        model.tensorize_dataset(iter(raw), parallelize=False),
        max_minibatch_size=64, parallelize=False)))[0]
    return "graph2seq", module, params, mb


def bench_graph2seq():
    measure(*build_graph2seq())


if __name__ == "__main__":
    bench_typilus()
    bench_ppi()
    bench_varmisuse()
    bench_graph2seq()


BUILDERS = {
    "typilus": build_typilus,
    "ppi": build_ppi,
    "varmisuse": build_varmisuse,
    "graph2seq": build_graph2seq,
}
