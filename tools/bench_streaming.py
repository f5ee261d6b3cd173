"""End-to-end STREAMING train throughput for Graph2Class.

bench.py times the device step over pre-staged device batches; this tool
times the configuration the reference's published V100 numbers measure
(typilus/train.py stores tensorized data in memory, so its steady state
re-assembles + uploads every minibatch each epoch): the real host pipeline
— threaded minibatch assembly + finalization (`minibatch_iterator`),
device prefetch (`_prefetch_device_batches`) — feeding the jitted step.

Reports, separately:
  * one-off tensorize pass (raw -> tensorized, cached across epochs),
  * host-only assembly throughput (no device work),
  * steady-state streamed epochs (host pipeline + H2D + device step),
  * device-only throughput over the same batches, for the overhead delta.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-nodes", type=int, default=8192)
    ap.add_argument("--edge-slots-per-node", type=float, default=6)
    ap.add_argument("--num-graphs", type=int, default=120)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--prefetch", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ptgnn_tpu.core.trainer import _prefetch_device_batches
    from ptgnn_tpu.graph.structs import BatchPadding
    from ptgnn_tpu.implementations.typilus.harness import build_graph2class
    from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

    max_nodes = args.max_nodes
    padding = BatchPadding(
        max_nodes=max_nodes,
        max_edge_slots=int(max_nodes * args.edge_slots_per_node) // 128 * 128,
        max_graphs=max(8, max_nodes // 1024),
        edge_tile=128,
        agg_rows=256,
        reference_budgets=(
            ("supernodes", max(512, max_nodes // 16)),
            ("token-sequence", max_nodes),
        ),
    )
    # Metadata/model from the harness (small metadata pass), data generated
    # separately so the tensorize pass is timed on the full corpus.
    model, module, params, _ = build_graph2class(
        padding=padding, num_metadata_graphs=32, mean_nodes=2500,
        max_graph_nodes=8000, hidden_state_size=64,
        num_minibatches=1, minibatch_size=300,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    raw = list(
        synthetic_typilus_graphs(
            args.num_graphs, seed=11, mean_nodes=2500, max_nodes=8000
        )
    )
    gen_s = time.time() - t0
    t0 = time.time()
    cached = list(model.tensorize_dataset(iter(raw), parallelize=True))
    tensorize_s = time.time() - t0
    print(
        f"corpus: {len(cached)} graphs (gen {gen_s:.1f}s, "
        f"tensorize {tensorize_s:.1f}s = {len(cached)/tensorize_s:.1f} graphs/s)",
        flush=True,
    )

    # ---- host-only assembly: the pipeline with the device loop removed ----
    t0 = time.time()
    n_batches = 0
    host_edges = 0
    for mb, _ in model.minibatch_iterator(
        iter(cached), max_minibatch_size=300, shuffle_input=False
    ):
        n_batches += 1
        host_edges += int(mb["batch"].num_edges)
    host_s = time.time() - t0
    print(
        f"host-only assembly: {n_batches} batches in {host_s:.2f}s "
        f"({host_s/n_batches*1000:.1f} ms/batch, {host_edges/host_s/1e3:.0f}k edges/s)",
        flush=True,
    )

    # ---- jitted step (same as bench.py) ----------------------------------
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2.5e-4))
    opt_state = optimizer.init(params)

    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def train_step(params, opt_state, mb, rng):
        def lf(p):
            loss, _ = module.apply(
                _cast(p, jnp.bfloat16), **_cast(mb, jnp.bfloat16),
                train=True, rng=rng,
            )
            return loss.astype(jnp.float32)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = optimizer.update(
            _cast(grads, jnp.float32), opt_state, params
        )
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    # ---- streamed epochs ---------------------------------------------------
    import random

    loss = None
    for epoch in range(args.epochs):
        t0 = time.time()
        batches = 0
        it = model.minibatch_iterator(
            iter(cached), max_minibatch_size=300, shuffle_input=True,
            shuffle_rng=random.Random(epoch),
        )
        for dev_mb, _raw in _prefetch_device_batches(it, args.prefetch):
            params, opt_state, loss = step(
                params, opt_state, dev_mb,
                jax.random.PRNGKey(epoch * 1000 + batches),
            )
            batches += 1
        float(loss)  # sync: a D2H transfer is the only true barrier here
        dt = time.time() - t0
        if epoch == 0:
            print(f"epoch 0 (compile): {dt:.1f}s, {batches} batches", flush=True)
        else:
            # total real edges per epoch == the host-only pass's sum (same
            # corpus; shuffle only repacks), so edges/s is host_edges / dt
            print(
                f"epoch {epoch}: {batches} batches in {dt:.2f}s "
                f"({dt/batches*1000:.1f} ms/batch, "
                f"~{host_edges/dt/1e3:.0f}k edges/s streamed)",
                flush=True,
            )

    # ---- device-only over the same (pre-staged) batches --------------------
    staged = []
    for mb, _ in model.minibatch_iterator(
        iter(cached), max_minibatch_size=300, shuffle_input=False
    ):
        staged.append((jax.device_put(mb), int(mb["batch"].num_edges)))
        if len(staged) >= 12:
            break
    t0 = time.time()
    reps = 3
    for r in range(reps):
        for dev_mb, _ in staged:
            params, opt_state, loss = step(params, opt_state, dev_mb, jax.random.PRNGKey(r))
    float(loss)
    dev_s = (time.time() - t0) / (reps * len(staged))
    dev_edges = sum(e for _, e in staged) / len(staged)
    print(
        f"device-only: {dev_s*1000:.1f} ms/batch ({dev_edges/dev_s/1e3:.0f}k edges/s)",
        flush=True,
    )
    total_edges = host_edges  # same corpus each epoch
    print(
        f"SUMMARY streamed steady-state: "
        f"{total_edges/1e3:.0f}k edges/epoch over {n_batches} batches",
        flush=True,
    )


if __name__ == "__main__":
    main()
