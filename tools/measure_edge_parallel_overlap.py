"""Measure the edge-parallel boundary exchange vs local compute (CPU mesh).

The edge-partitioned layer (parallel/edge_sharding.py) does, per MP layer:

    local:      masked segment reduce of this shard's messages   (compute)
    collective: one psum / pmax over the ``edge`` axis           (exchange)

The overlap design note (docs/tpu-performance.md) argues XLA's latency-hiding
scheduler can run the collective under the state-update matmuls because the
layer body consumes the aggregate as late as possible. This harness puts
numbers behind that note on the only mesh available here (8 virtual CPU
devices): it times, per call at a bench-like shape,

  * the per-shard local reduce alone (vmap over shards, no collective),
  * the full sharded aggregate (local + collective, under shard_map),
  * the collective alone on a same-shape [N, D] partial,

each chained K iterations inside one jit (ROUND_NOTES timing methodology).
CPU "ICI" is shared memory, so the absolute collective cost is optimistic;
the informative output is the exchange/compute *ratio* bounding the overlap
the scheduler would need to hide.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
         python tools/measure_edge_parallel_overlap.py
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# jax.config (same as tests/conftest.py) so the virtual mesh is available.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-shards", type=int, default=4)
    ap.add_argument("--num-nodes", type=int, default=2048)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from ptgnn_tpu.graph.batching import GraphBatcher
    from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData
    from ptgnn_tpu.ops.segment import segment_reduce, segment_sum
    from ptgnn_tpu.parallel.dp import _shard_map
    from ptgnn_tpu.parallel.edge_sharding import shard_adjacency, sharded_aggregate

    S, n, d = args.num_shards, args.num_nodes, args.dim
    devices = jax.devices()
    assert len(devices) >= S, f"need {S} devices, have {len(devices)}"
    mesh = Mesh(np.asarray(devices[:S]), ("edge",))

    rng = np.random.RandomState(0)
    padding = BatchPadding(
        max_nodes=n, max_edge_slots=n * 12 // 128 * 128, max_graphs=8,
        edge_tile=128, agg_rows=256,
    )
    batcher = GraphBatcher(
        3, padding, introduce_backwards_edges=True, add_self_edges=True
    )
    mb = batcher.initialize()
    per = n // 4 - 8
    for _ in range(3):
        adj = [
            (
                rng.randint(0, per, per * 2).astype(np.int32),
                rng.randint(0, per, per * 2).astype(np.int32),
            )
            for _ in range(3)
        ]
        g = TensorizedGraphData(
            num_nodes=per, node_tensorized_data=[0] * per,
            adjacency_lists=adj, edge_features=None, reference_nodes={},
        )
        assert batcher.can_add(g, mb)
        batcher.extend(g, mb)
    batch = batcher.finalize(mb, node_data={}, reference_names=[])
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    adj = batch.adjacency
    sharded = shard_adjacency(adj, S)
    e_local = sharded.senders.shape[1]
    msgs = jnp.asarray(rng.randn(S, e_local, d), dtype=jnp.float32)

    adj_specs = jax.tree_util.tree_map(lambda x: P("edge"), sharded)
    adj_specs = adj_specs._replace(agg_counts=P())

    def timed(fn, x, iters=args.iters):
        def run(x0):
            def once(carry, _):
                return fn(carry), None

            out, _ = jax.lax.scan(once, x0, None, length=iters)
            return out

        jitted = jax.jit(run)
        jitted(x).block_until_ready()  # compile
        t0 = time.perf_counter()
        float(jnp.sum(jitted(x)))  # chained run + D2H sync
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"shards={S} nodes={n} local_slots={e_local} dim={d} (CPU mesh)")
    for red in ("sum", "max"):
        # 1) local reduce only — vmap over the shard axis, no collective.
        def local_reduce(mm, snd, rcv, msk):
            if red == "sum":
                return segment_sum(mm, rcv, n, msk)
            work = jnp.where(msk[:, None], mm, -3.0e38)
            out = segment_reduce(work, rcv, n, "max", mask=None)
            return out

        def local_body(m):
            outs = jax.vmap(local_reduce)(
                m, sharded.senders, sharded.receivers, sharded.mask
            )
            return m + jnp.mean(outs) * 1e-6

        t_local = timed(local_body, msgs)

        # 2) local + collective via the real sharded_aggregate.
        def per_shard(m, a):
            la = jax.tree_util.tree_map(
                lambda x: None if x is None else x[0], a
            )._replace(agg_counts=adj.agg_counts)
            out = sharded_aggregate(m[0], la, n, red, axis_name="edge")
            return m + jnp.mean(out) * 1e-6

        full = _shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("edge"), adj_specs), out_specs=P("edge"),
        )
        t_full = timed(lambda m: full(m, sharded), msgs)

        # 3) collective alone on a same-shape [N, D] partial.
        part = jnp.asarray(rng.randn(S, n, d), dtype=jnp.float32)
        coll = _shard_map(
            lambda x: (
                jax.lax.psum(x[0], "edge") if red == "sum"
                else jax.lax.pmax(x[0], "edge")
            )[None],
            mesh=mesh, in_specs=(P("edge"),), out_specs=P("edge"),
        )
        t_coll = timed(lambda x: x + coll(x) * 1e-6, part)

        print(
            f"{red:>4}: local reduce {t_local:.3f} ms/call | "
            f"local+collective {t_full:.3f} ms | collective alone "
            f"{t_coll:.3f} ms | exchange/compute {t_coll / max(t_local, 1e-9):.2f}"
        )


if __name__ == "__main__":
    main()
