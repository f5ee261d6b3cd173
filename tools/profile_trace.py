"""Per-op device profile of the bench train step via jax.profiler.

The axon tunnel passes device tracks through `jax.profiler.trace`; the
exported Chrome trace contains an `XLA Ops` thread whose events carry
`tf_op` (the jaxpr op path), `source` (file:line), and
`shape_with_layout`. This tool captures 3 steps at bench shapes and
prints three aggregations: by op kind, by source line, and the individual
Pallas/gather calls — the views that located the round-4 gather bill
(docs/tpu-performance.md "The gather bill, paid down").

Run on TPU:  python tools/profile_trace.py [--max-nodes 8192]
"""
import argparse
import collections
import glob
import gzip
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def capture(max_nodes: int, edge_slots_per_node: float, steps: int) -> str:
    import jax
    import jax.numpy as jnp
    import optax

    from ptgnn_tpu.graph.structs import BatchPadding
    from ptgnn_tpu.implementations.typilus.harness import build_graph2class

    print("backend:", jax.default_backend(), file=sys.stderr)
    mn = max_nodes
    padding = BatchPadding(
        max_nodes=mn,
        max_edge_slots=int(mn * edge_slots_per_node) // 128 * 128,
        max_graphs=max(8, mn // 1024),
        edge_tile=128, agg_rows=256, agg_sum_tile=512,
        reference_budgets=(("supernodes", max(512, mn // 16)), ("token-sequence", mn)),
    )
    model, module, params, mbs = build_graph2class(
        padding=padding, num_metadata_graphs=16, mean_nodes=2500,
        max_graph_nodes=8000, hidden_state_size=64, num_minibatches=1,
        minibatch_size=300,
    )
    mb = jax.device_put(mbs[0])
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2.5e-4))
    opt_state = optimizer.init(params)

    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)

    def train_step(params, opt_state, mb, rng):
        def lf(p):
            loss, _ = module.apply(
                _cast(p, jnp.bfloat16), **_cast(mb, jnp.bfloat16),
                train=True, rng=rng)
            return loss.astype(jnp.float32)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = optimizer.update(_cast(grads, jnp.float32), opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(0))
    float(loss)  # tunnel: only a D2H read truly synchronizes
    outdir = tempfile.mkdtemp(prefix="ptgnn_trace_")
    with jax.profiler.trace(outdir):
        for i in range(steps):
            params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(100 + i))
        float(loss)
    return outdir


def report(outdir: str, steps: int, top: int) -> None:
    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced (profiler unsupported on this backend?)", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    pids, tids = {}, {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pids[ev["pid"]] = ev["args"].get("name", "?")
            if ev.get("name") == "thread_name":
                tids[(ev["pid"], ev["tid"])] = ev["args"].get("name", "?")

    by_kind = collections.Counter()
    kind_n = collections.Counter()
    by_src = collections.Counter()
    src_n = collections.Counter()
    calls = collections.Counter()
    calls_n = collections.Counter()
    total = 0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if not pids.get(ev.get("pid"), "").startswith("/device"):
            continue
        if tids.get((ev["pid"], ev["tid"])) != "XLA Ops":
            continue
        a = ev.get("args") or {}
        dur = ev["dur"]
        total += dur
        kind = (a.get("tf_op") or "?").split("/")[-1]
        by_kind[kind] += dur
        kind_n[kind] += 1
        src = a.get("source", "<none>").replace(str(Path(__file__).parent.parent) + "/", "")
        by_src[src] += dur
        src_n[src] += 1
        if kind in ("pallas_call:", "gather:"):
            key = (kind, src, a.get("shape_with_layout", "?")[:44])
            calls[key] += dur
            calls_n[key] += 1

    print(f"device op time: {total / (1000 * steps):.2f} ms/step")
    print("\n== by op kind ==")
    for name, d in by_kind.most_common(top):
        print(f"{d / (1000 * steps):8.3f} ms/step x{kind_n[name] // steps:<5} {name[:60]}")
    print("\n== by source line ==")
    for name, d in by_src.most_common(top):
        print(f"{d / (1000 * steps):8.3f} ms/step x{src_n[name] // steps:<5} {name[:80]}")
    print("\n== pallas / gather calls ==")
    for (kind, src, shp), d in calls.most_common(top):
        n = max(1, calls_n[(kind, src, shp)])
        print(f"{d / (1000 * steps):8.3f} ms/step x{n // steps:<4} avg {d / n:6.1f}us "
              f"{kind} {src} {shp}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-nodes", type=int, default=8192)
    ap.add_argument("--edge-slots-per-node", type=float, default=6)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()
    outdir = capture(args.max_nodes, args.edge_slots_per_node, args.steps)
    report(outdir, args.steps, args.top)


if __name__ == "__main__":
    main()
