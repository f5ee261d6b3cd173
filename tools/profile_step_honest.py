"""Honest step-composition profile on the real chip.

`jax.block_until_ready` does not synchronize through the axon tunnel, so
every timing here chains K iterations inside ONE jitted lax.fori_loop and
ends with a device-to-host float() read (ROUND_NOTES methodology). Reports
the bench config's full train step, forward-only, eval step, and the
per-call cost of the batch's actual aggregation (max vs sum, AMP dtype) so
the extremum share of the step is measured, not inferred.

Run on TPU: python tools/profile_step_honest.py [--max-nodes 8192]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-nodes", type=int, default=8192)
    ap.add_argument("--edge-slots-per-node", type=float, default=6)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--no-amp", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ptgnn_tpu.graph.structs import BatchPadding
    from ptgnn_tpu.implementations.typilus.harness import build_graph2class

    print("backend:", jax.default_backend(), file=sys.stderr)
    mn = args.max_nodes
    padding = BatchPadding(
        max_nodes=mn,
        max_edge_slots=int(mn * args.edge_slots_per_node) // 128 * 128,
        max_graphs=max(8, mn // 1024),
        edge_tile=128, agg_rows=256, agg_sum_tile=512,
        reference_budgets=(("supernodes", max(512, mn // 16)), ("token-sequence", mn)),
    )
    model, module, params, minibatches = build_graph2class(
        padding=padding, num_metadata_graphs=16, mean_nodes=2500,
        max_graph_nodes=8000, hidden_state_size=64, num_minibatches=1,
        minibatch_size=300,
    )
    mb = jax.device_put(minibatches[0])
    edges = int(minibatches[0]["batch"].num_edges)
    amp = not args.no_amp

    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2.5e-4))
    opt_state = optimizer.init(params)
    K = args.iters

    def loss_fn(p, m, rng):
        if amp:
            p = _cast(p, jnp.bfloat16); m = _cast(m, jnp.bfloat16)
        loss, _ = module.apply(p, **m, train=True, rng=rng)
        return loss.astype(jnp.float32)

    def chain(body, init):
        """K dependent iterations of body inside one jit; returns ms/iter."""
        f = jax.jit(lambda c: jax.lax.fori_loop(0, K, body, c))
        c = f(init)                       # compile + warm
        leaf = jax.tree_util.tree_leaves(c)[0]
        float(leaf.reshape(-1)[0].astype(jnp.float32))
        t0 = time.time()
        c = f(c)
        leaf = jax.tree_util.tree_leaves(c)[0]
        float(leaf.reshape(-1)[0].astype(jnp.float32))
        return (time.time() - t0) / K * 1000

    # 1. full train step
    def step_body(i, carry):
        p, s = carry
        rng = jax.random.fold_in(jax.random.PRNGKey(0), i)
        grads = jax.grad(loss_fn)(p, mb, rng)
        grads = _cast(grads, jnp.float32)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s

    ms_step = chain(step_body, (params, opt_state))
    print(f"train step: {ms_step:.2f} ms  ({edges / ms_step:.0f}k edges/s)")

    # 2. forward only (loss, train mode)
    def fwd_body(i, acc):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
        return acc + loss_fn(params, mb, rng)

    ms_fwd = chain(fwd_body, jnp.zeros(()))
    print(f"forward (train): {ms_fwd:.2f} ms -> backward+adam ~ {ms_step - ms_fwd:.2f} ms")

    # 3. eval forward
    def eval_body(i, acc):
        p = _cast(params, jnp.bfloat16) if amp else params
        m = _cast(mb, jnp.bfloat16) if amp else mb
        loss, _ = module.apply(p, **m, train=False)
        return acc + loss.astype(jnp.float32)

    ms_ev = chain(eval_body, jnp.zeros(()))
    print(f"eval step: {ms_ev:.2f} ms  ({edges / ms_ev:.0f}k edges/s inference)")

    # 4. aggregation micro on the REAL batch layout + dtype
    from ptgnn_tpu.ops.pallas.segment_kernels import adjacency_segment_reduce

    adj = mb["batch"].adjacency
    e_pad = adj.senders.shape[0]
    d = 64
    rng0 = np.random.RandomState(0)
    dt = jnp.bfloat16 if amp else jnp.float32
    data0 = jnp.asarray(rng0.randn(e_pad, d).astype(np.float32)).astype(dt)

    for red in ("max", "sum", "mean"):
        def agg_body(i, c, red=red):
            out = adjacency_segment_reduce(
                c * jnp.asarray(1.0, dt) + jnp.asarray(0.0, dt), adj, mn, red,
                mask=adj.mask)
            # feed output back through a gather to serialize iterations
            return c + jnp.take(out, adj.receivers, axis=0, mode="fill",
                                fill_value=0.0) * jnp.asarray(1e-9, dt)

        ms = chain(agg_body, data0)
        print(f"adjacency_segment_reduce {red} [{e_pad}, {d}] {dt.__name__}: {ms:.2f} ms"
              f"  (includes one [{e_pad},{d}] gather)")

    # gather-only baseline to subtract
    out0 = jnp.zeros((mn, d), dt)

    def gather_body(i, c):
        return c + jnp.take(out0 + c[0, 0], adj.receivers, axis=0, mode="fill",
                            fill_value=0.0) * jnp.asarray(1e-9, dt)

    ms_g = chain(gather_body, data0)
    print(f"gather-only baseline [{e_pad}, {d}] {dt.__name__}: {ms_g:.2f} ms")


if __name__ == "__main__":
    main()
