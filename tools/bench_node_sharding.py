"""Node-sharded (NodeParallel) measurement at BENCH shapes.

Runs the headline Graph2Class configuration (8,192-node batches, 6 edge
slots/node — the same shapes bench.py measures on the real chip) through
`parallel.node_sharding` on the virtual CPU mesh, and reports for each
shard count:

  * exchange volume: real boundary rows per layer vs N (the O(boundary*D)
    vs O(N*D) claim at production shapes, not toy ones), and the padded
    rows the static all_to_all actually ships;
  * per-shard node-array rows (N/S + S*b memory-scaling claim);
  * step wall-clock vs the single-device step on the same backend. On a
    CPU mesh all "chips" share one socket, so sharded wall-clock measures
    OVERHEAD (layout splitting + collectives), not speedup — the number to
    watch is how small the overhead ratio stays while node memory drops.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/bench_node_sharding.py [--max-nodes 8192] [--steps 5]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.harness import build_graph2class
from ptgnn_tpu.parallel.node_sharding import NodeParallel, suggest_budgets


def build(max_nodes: int, num_batches: int, topology: str = "random"):
    padding = BatchPadding(
        max_nodes=max_nodes,
        max_edge_slots=int(max_nodes * 6) // 128 * 128,
        max_graphs=max(8, max_nodes // 1024),
        edge_tile=128,
        agg_rows=256,
        agg_sum_tile=512,
        reference_budgets=(
            ("supernodes", max(512, max_nodes // 16)),
            ("token-sequence", max_nodes),
        ),
    )
    return build_graph2class(
        padding=padding,
        num_metadata_graphs=max(32, 2 * num_batches * (max_nodes // 2500 + 1)),
        mean_nodes=2500,
        max_graph_nodes=8000,
        hidden_state_size=64,
        num_minibatches=num_batches,
        minibatch_size=300,
        topology=topology,
    )


def time_steps(step, params, opt_state, rest, steps: int) -> float:
    """Times `step(params, opt_state, *rest)` threading the (possibly
    donated) params/opt_state through the loop; syncs on the loss."""
    out = step(params, opt_state, *rest)
    params, opt_state = out[0], out[1]
    float(out[2])
    t0 = time.time()
    for _ in range(steps):
        out = step(params, opt_state, *rest)
        params, opt_state = out[0], out[1]
    float(out[2])
    return (time.time() - t0) / steps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-nodes", type=int, default=8192)
    ap.add_argument("--num-batches", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--shards", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--topology", choices=["random", "ast"], default="random")
    ap.add_argument("--reorder", choices=["auto", "bfs", "none"], default="auto")
    args = ap.parse_args()
    reorder = None if args.reorder == "none" else args.reorder

    ndev = len(jax.devices())
    print(f"backend: {jax.default_backend()}, {ndev} devices", file=sys.stderr)

    t0 = time.time()
    model, module, params, mbs = build(args.max_nodes, args.num_batches, args.topology)
    mb = mbs[0]
    edges = int(mb["batch"].num_edges)
    nodes = int(mb["batch"].num_nodes)
    n_pad = mb["batch"].max_nodes
    print(
        f"setup {time.time()-t0:.1f}s; batch: {nodes} real nodes "
        f"(padded {n_pad}), {edges} edges",
        file=sys.stderr,
    )

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2.5e-4))
    rng = jax.random.PRNGKey(0)

    # -- single-device baseline on the same backend ------------------------
    def loss_fn(p, mb):
        loss, _ = module.apply(p, **mb, train=True, rng=rng)
        return loss

    def sd_step(p, s, mb):
        loss, grads = jax.value_and_grad(loss_fn)(p, mb)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    sd = jax.jit(sd_step)
    p0 = jax.tree_util.tree_map(jnp.copy, params)
    sd_time = time_steps(sd, p0, optimizer.init(p0), (mb,), args.steps)
    print(
        f"single-device: {sd_time*1e3:.0f} ms/step "
        f"({edges/sd_time/1e3:.0f}k edges/s on this backend)",
        file=sys.stderr,
    )

    rows = []
    for S in args.shards:
        if S > ndev:
            print(f"S={S}: skipped ({ndev} devices)", file=sys.stderr)
            continue
        budgets = suggest_budgets(mbs, S, reorder=reorder)
        mesh = Mesh(np.asarray(jax.devices()[:S]), ("node",))
        npar = NodeParallel(module, optimizer, mesh, axis="node", reorder=reorder, **budgets)
        sharded = [npar.shard_batch(m) for m in mbs]
        st = npar.last_stats
        step = npar.build_train_step(sharded[0])
        p1 = jax.tree_util.tree_map(jnp.copy, params)
        sh_time = time_steps(
            step, p1, optimizer.init(p1), (sharded[0], rng), args.steps
        )
        module.gnn.node_partition_axis = None
        rows_per_ext = st["rows_per_shard"] + S * st["boundary_budget"]
        rows.append(
            dict(
                S=S,
                ms=sh_time * 1e3,
                overhead=sh_time / sd_time,
                boundary_real=st["boundary_nodes_total"],
                boundary_padded=st["exchanged_rows_padded"],
                rows_per_shard=st["rows_per_shard"],
                rows_ext=rows_per_ext,
                mem_frac=rows_per_ext / n_pad,
            )
        )
        print(
            f"S={S}: {sh_time*1e3:.0f} ms/step ({sh_time/sd_time:.2f}x single-dev); "
            f"exchange/layer: {st['boundary_nodes_total']} real rows "
            f"({st['boundary_nodes_total']/n_pad:.2f} of N), "
            f"{st['exchanged_rows_padded']} padded; "
            f"node rows/shard {st['rows_per_shard']}+{S*st['boundary_budget']} recv "
            f"= {rows_per_ext/n_pad:.2f} of N",
            file=sys.stderr,
        )

    import json

    print(json.dumps({"max_nodes": args.max_nodes, "edges": edges,
                      "topology": args.topology, "reorder": args.reorder,
                      "single_device_ms": round(sd_time * 1e3, 1),
                      "shards": rows}))


if __name__ == "__main__":
    main()
