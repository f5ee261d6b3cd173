"""Real-TPU validation + timing of the supertile sum path on the actual
batcher layout (production kernels only — no experimental kernel shapes).

1. correctness: adjacency_segment_reduce sum/mean/max/min vs XLA segment ops
   on a batcher-built Typilus-sized batch;
2. timing: supertile sum plan vs edge-tile plan, f32 + bf16, in-jit chains.
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np

from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.harness import build_graph2class
from ptgnn_tpu.ops.pallas import segment_kernels as sk
from ptgnn_tpu.ops import segment as xseg

MAX_NODES = 8192
EDGE_TILE = 128
ITERS = 60


def time_loop(body, x0, iters=ITERS):
    @jax.jit
    def run(o):
        return jax.lax.fori_loop(0, iters, lambda i, o: body(o), o)

    r = run(x0)
    float(jnp.sum(jnp.asarray(r, jnp.float32)))
    t0 = time.time()
    r = run(x0)
    float(jnp.sum(jnp.asarray(r, jnp.float32)))
    return (time.time() - t0) / iters * 1000


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    padding = BatchPadding(
        max_nodes=MAX_NODES,
        max_edge_slots=MAX_NODES * 6 // EDGE_TILE * EDGE_TILE,
        max_graphs=8,
        edge_tile=EDGE_TILE,
        agg_rows=256,
        agg_sum_tile=512,
        reference_budgets=(("supernodes", 512), ("token-sequence", MAX_NODES)),
    )
    model, module, params, mbs = build_graph2class(
        padding=padding, num_metadata_graphs=24, mean_nodes=2500,
        max_graph_nodes=8000, hidden_state_size=64, num_minibatches=1,
        minibatch_size=300,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, mbs[0]["batch"])
    adj = batch.adjacency
    e_pad = adj.senders.shape[0]
    n_super = None if adj.super_tile_row_blocks is None else adj.super_tile_row_blocks.shape[0]
    print(f"batch: edges={int(batch.num_edges)} slots={e_pad} supertiles={n_super}", flush=True)
    assert adj.super_tile_row_blocks is not None, "supertile alignment missing!"

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(e_pad, 64).astype(np.float32))

    # ---- correctness on the REAL layout ----
    for red in ("sum", "mean", "max", "min"):
        got = sk.adjacency_segment_reduce(data, adj, MAX_NODES, red, mask=adj.mask)
        want = xseg.segment_reduce(data, adj.receivers, MAX_NODES, red, mask=adj.mask)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"correctness {red}: max abs err {err:.2e}", flush=True)
        assert err < 1e-3, red

    # ---- timing: super vs edge-tile sum; extremum ----
    recv_chain = jnp.asarray(np.arange(e_pad, dtype=np.int32) % MAX_NODES)
    sup_plan = sk.sum_plan_from_adjacency(adj)
    tile_plan = sk.plan_from_adjacency(adj)
    for dtn, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x0 = data[:MAX_NODES].astype(dt)

        def expand(o):
            return jnp.take(o, recv_chain, axis=0)

        t_gather = time_loop(lambda o: expand(o)[:MAX_NODES], x0)

        def body_super(o):
            d = jnp.where(adj.mask[:, None], expand(o), jnp.asarray(0, dt))
            return sk.planned_segment_sum(d, None, sup_plan, MAX_NODES).astype(dt)

        def body_tile(o):
            d = jnp.where(adj.mask[:, None], expand(o), jnp.asarray(0, dt))
            return sk.planned_segment_sum(d, None, tile_plan, MAX_NODES).astype(dt)

        neu = jnp.asarray(
            jnp.finfo(jnp.bfloat16).min if dt == jnp.bfloat16 else -sk._BIG, dt
        )

        def body_max(o):
            d = jnp.where(adj.mask[:, None], expand(o), neu)
            return sk.planned_segment_extremum(d, None, tile_plan, MAX_NODES, True).astype(dt)

        def body_xla(o):
            d = jnp.where(adj.mask[:, None], expand(o), jnp.asarray(0, dt))
            return jax.ops.segment_sum(d, adj.receivers, num_segments=MAX_NODES)

        ts = time_loop(body_super, x0)
        tt = time_loop(body_tile, x0)
        tm = time_loop(body_max, x0)
        tx = time_loop(body_xla, x0)
        print(
            f"{dtn}: sum super {ts - t_gather:.3f} ms | sum edge-tile {tt - t_gather:.3f} ms | "
            f"max {tm - t_gather:.3f} ms | xla sum {tx - t_gather:.3f} ms (chain {t_gather:.3f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
