#!/usr/bin/env python
"""Validate the Pallas aggregation kernels on PER-SHARD node-sharding
layouts, on the real TPU chip (VERDICT r3 weak #6 / next #5).

The node-sharded stack runs the same planned kernels as the single-device
path but over the per-shard interior/boundary layouts (smaller rows_per,
re-derived agg_rows, separate plans). Those layouts had only ever executed
inside shard_map on the CPU mesh; given this toolchain's Mosaic fragility,
this script feeds ONE shard's interior and boundary layouts to the kernels
on a single real TPU device and checks them against the XLA segment-op
fallback computed on host.

Run (real chip — do NOT force CPU):
    python tools/tpu_validate_sharded_layouts.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    backend = jax.default_backend()
    print(f"backend: {backend}; devices: {jax.devices()}")
    if backend != "tpu":
        print("WARNING: not a TPU backend — this run validates shapes only")

    from ptgnn_tpu.implementations.typilus.harness import (
        build_graph2class,
        small_padding,
    )
    from ptgnn_tpu.ops.pallas.segment_kernels import adjacency_segment_reduce
    from ptgnn_tpu.ops.segment import segment_reduce
    from ptgnn_tpu.parallel.node_sharding import (
        shard_batch_by_nodes,
        suggest_budgets,
    )

    # Bench-like shapes scaled to one shard: 8192-node batch over 4 shards
    # -> 2048 rows/shard, the same tile/agg geometry as the flagship config.
    _, _, _, mbs = build_graph2class(
        padding=small_padding(max_nodes=8192, max_graphs=64),
        num_metadata_graphs=48, mean_nodes=600, max_graph_nodes=1200,
        hidden_state_size=64, num_minibatches=1, minibatch_size=16,
        dropout_rate=0.0,
    )
    mb = mbs[0]
    budgets = suggest_budgets([mb], 4)
    sharded, stats = shard_batch_by_nodes(mb, 4, **budgets)
    print(f"shard stats: {stats}")
    sb = sharded["batch"]
    rows_per = stats["rows_per_shard"]

    rng = np.random.RandomState(0)
    ok = True
    for name, adj_stacked in (
        ("interior", sb.adjacency),
        ("boundary", sb.node_sharding.adjacency_bnd),
    ):
        adj = jax.tree_util.tree_map(
            lambda x: None if x is None else np.asarray(x)[0], adj_stacked
        )
        e_pad = adj.senders.shape[0]
        data = rng.randn(e_pad, 64).astype(np.float32)
        for reduction in ("sum", "mean", "max"):
            expected = np.asarray(
                segment_reduce(
                    jnp.asarray(data), jnp.asarray(adj.receivers), rows_per,
                    reduction, mask=jnp.asarray(adj.mask),
                )
            )
            fn = jax.jit(
                lambda d, a: adjacency_segment_reduce(
                    d, a, rows_per, reduction, mask=a.mask, counts_exact=True
                )
            )
            t0 = time.time()
            out = np.asarray(fn(jnp.asarray(data), adj))
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                out = np.asarray(fn(jnp.asarray(data), adj))
            run_ms = (time.time() - t0) / 3 * 1e3
            err = float(np.abs(out - expected).max())
            status = "OK" if err < 1e-4 else "MISMATCH"
            ok = ok and err < 1e-4
            print(
                f"{name:8s} {reduction:4s} [{e_pad} slots -> {rows_per} rows]: "
                f"{status} maxerr={err:.2e} compile={compile_s:.1f}s "
                f"round-trip={run_ms:.2f}ms"
            )
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
