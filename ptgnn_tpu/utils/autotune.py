"""Occupancy autotuner: pick the BatchPadding that maximizes real
throughput for a given model family and data distribution.

Why this exists: on TPU the padded batch IS the unit of cost — every segment
kernel walks ``max_edge_slots`` slots whether they hold real edges or
padding, and the irregular-op cost grows superlinearly with batch size on
some stacks (BASELINE.md: 8k-node batches outperform 32k per edge by 2.5x on
v5e). The reference has no analogue (CUDA scatter cost follows real edges);
here the occupancy knobs (``max_nodes``, edge-slot budget) are
data-dependent and worth a measured sweep per deployment.

Usage::

    from ptgnn_tpu.utils.autotune import sweep_paddings, default_candidates

    def build(padding):
        model = create_graph2class_gnn_model(hidden_state_size=64, padding=padding)
        model.compute_metadata(raw_data())
        module = model.build_neural_module()
        params = module.init(jax.random.PRNGKey(0))
        mbs = [mb for mb, _ in model.minibatch_iterator(
            model.tensorize_dataset(raw_data()), max_minibatch_size=300)]
        return module, params, mbs[:1]

    results = sweep_paddings(build, default_candidates(edge_tile=128))
    best = results[0]          # sorted by measured edges/s, best first

Timing is tunnel-safe: each candidate chains ``steps`` jitted train steps
and syncs once with a host read (block_until_ready does not synchronize
through the axon tunnel — see docs/tpu-performance.md).
"""
from __future__ import annotations

import dataclasses
import logging
import time

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from ptgnn_tpu.graph.structs import BatchPadding

LOGGER = logging.getLogger(__name__)

BuildFn = Callable[[BatchPadding], Tuple[Any, Any, List[Dict[str, Any]]]]


@dataclasses.dataclass
class TuneResult:
    padding: BatchPadding
    edges_per_sec: float
    ms_per_step: float
    real_edges: int
    real_graphs: int
    error: Optional[str] = None


def default_candidates(
    *,
    max_nodes_options: Sequence[int] = (4096, 8192, 16384),
    slots_per_node_options: Sequence[float] = (5.0, 6.0, 8.0),
    edge_tile: int = 128,
    agg_rows: int = 256,
    agg_sum_tile: int = 512,
    reference_budgets_fn: Optional[Callable[[int], tuple]] = None,
) -> List[BatchPadding]:
    """The grid the v5e measurements identified as the relevant region."""
    cands = []
    for mn in max_nodes_options:
        for spn in slots_per_node_options:
            budgets = (
                reference_budgets_fn(mn) if reference_budgets_fn is not None else ()
            )
            cands.append(
                BatchPadding(
                    max_nodes=mn,
                    max_edge_slots=int(mn * spn) // edge_tile * edge_tile,
                    max_graphs=max(8, mn // 1024),
                    edge_tile=edge_tile,
                    agg_rows=agg_rows,
                    agg_sum_tile=agg_sum_tile,
                    reference_budgets=budgets,
                )
            )
    return cands


def measure_padding(
    build: BuildFn,
    padding: BatchPadding,
    *,
    steps: int = 30,
    amp: bool = True,
    optimizer=None,
    seed: int = 0,
) -> TuneResult:
    """Build the model at this padding and measure train-step throughput."""
    import jax
    import jax.numpy as jnp
    import optax

    try:
        module, params, minibatches = build(padding)
    except Exception as e:  # candidate infeasible (budget too small, OOM, ...)
        return TuneResult(padding, 0.0, float("inf"), 0, 0, error=repr(e))
    if not minibatches:
        # every sampled graph exceeded this candidate's budgets (the batcher
        # silently drops graphs that can't fit an empty batch) — infeasible,
        # not an error for the whole sweep
        return TuneResult(padding, 0.0, float("inf"), 0, 0, error="no graphs fit")
    from ptgnn_tpu.parallel.dp import _cast_floats as _cast

    mb = jax.device_put(minibatches[0])
    opt = optimizer or optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
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

    try:
        step = jax.jit(train_step, donate_argnums=(0, 1))
        params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(seed))
        if not bool(jnp.isfinite(loss)):
            return TuneResult(padding, 0.0, float("inf"), 0, 0, error="non-finite loss")
        t0 = time.time()
        for i in range(steps):
            params, opt_state, loss = step(
                params, opt_state, mb, jax.random.PRNGKey(seed + 1 + i)
            )
        float(loss)  # the host read is the only reliable sync on this stack
        dt = (time.time() - t0) / steps
    except Exception as e:
        return TuneResult(padding, 0.0, float("inf"), 0, 0, error=repr(e))
    edges = int(mb["batch"].num_edges)
    graphs = int(mb["batch"].num_graphs)
    return TuneResult(padding, edges / dt, dt * 1e3, edges, graphs)


def sweep_paddings(
    build: BuildFn,
    candidates: Sequence[BatchPadding],
    *,
    steps: int = 30,
    amp: bool = True,
    optimizer=None,
) -> List[TuneResult]:
    """Measure every candidate; return results sorted best-first.

    Infeasible candidates (build or compile failure) come last with
    ``error`` set instead of aborting the sweep.
    """
    results = []
    for padding in candidates:
        r = measure_padding(build, padding, steps=steps, amp=amp, optimizer=optimizer)
        if r.error:
            LOGGER.info("autotune: candidate %s infeasible: %s", _tag(padding), r.error)
        else:
            LOGGER.info(
                "autotune: %s -> %.0fk edges/s (%.1f ms/step, %d real edges)",
                _tag(padding), r.edges_per_sec / 1e3, r.ms_per_step, r.real_edges,
            )
        results.append(r)
    return sorted(results, key=lambda r: -r.edges_per_sec)


def _tag(p: BatchPadding) -> str:
    return (
        f"nodes={p.max_nodes} slots={p.max_edge_slots} tile={p.edge_tile} "
        f"rows={p.agg_rows}"
    )


def clone_with_padding(model, padding: BatchPadding):
    """Deep-copy a (metadata-initialized) task model with every embedded
    GraphNeuralNetworkModel re-budgeted to ``padding``. Metadata
    (vocabularies, edge-type registries) is padding-independent, so the
    clone tensorizes/minibatches at the new shapes without a second data
    pass."""
    import copy

    from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel

    clone = copy.deepcopy(model)
    seen = set()

    def walk(obj):
        if id(obj) in seen or not hasattr(obj, "__dict__"):
            return
        seen.add(id(obj))
        if isinstance(obj, GraphNeuralNetworkModel):
            obj.padding = padding
            obj.max_nodes_per_graph = min(obj.max_nodes_per_graph, padding.max_nodes)
            obj.stop_extending_minibatch_after_num_nodes = min(
                obj.stop_extending_minibatch_after_num_nodes, padding.max_nodes
            )
        for v in obj.__dict__.values():
            walk(v)

    walk(clone)
    return clone


def autotune_task_model(
    model,
    training_data,
    *,
    minibatch_size: int,
    candidates: Optional[Sequence[BatchPadding]] = None,
    reference_budgets_fn: Optional[Callable[[int], tuple]] = None,
    sample_limit: int = 64,
    steps: int = 20,
    amp: bool = True,
    parallelize: bool = True,
):
    """Measure candidate paddings on the task's OWN data and return
    (retuned model clone, sorted TuneResults).

    Computes metadata once (if needed), tensorizes up to ``sample_limit``
    training samples, then for each candidate re-budgets a clone, builds one
    real minibatch, and measures jitted train-step throughput. Wire into the
    train CLIs via ``--autotune``.
    """
    import itertools

    import jax

    if not model.metadata_initialized:
        model.compute_metadata(iter(training_data), parallelize=parallelize)
    tensorized = [
        t
        for t, _ in model.tensorize_dataset(
            itertools.islice(iter(training_data), sample_limit),
            parallelize=parallelize,
        )
    ]
    assert tensorized, "autotune: no training samples survived tensorization"
    if candidates is None:
        candidates = default_candidates(reference_budgets_fn=reference_budgets_fn)

    def build(padding: BatchPadding):
        m = clone_with_padding(model, padding)
        module = m.build_neural_module()
        params = module.init(jax.random.PRNGKey(0))
        mbs = []
        for mb, _ in m.minibatch_iterator(
            ((t, None) for t in tensorized),
            max_minibatch_size=minibatch_size,
            parallelize=False,
        ):
            mbs.append(mb)
            break
        return module, params, mbs

    results = sweep_paddings(build, candidates, steps=steps, amp=amp)
    best = results[0]
    assert best.error is None, f"autotune: every candidate failed: {results}"
    LOGGER.info(
        "autotune: selected %s (%.0fk edges/s)",
        _tag(best.padding), best.edges_per_sec / 1e3,
    )
    return clone_with_padding(model, best.padding), results
