"""A minimal functional module system for TPU-native models.

The reference pairs a picklable ``AbstractNeuralModel`` with a stateful
``torch.nn.Module`` (reference: ptgnn/baseneuralmodel/abstractneuralmodel.py:36,
modulewithmetrics.py:8). On TPU the neural side must be a pure function of a
parameter pytree so it can be ``jax.jit``-ed, differentiated, and sharded with
``pjit``/``shard_map``. A ``Module`` here is a *declarative description*:
hyperparameters live on the object (static, hashable by identity), parameters
are produced by ``init(key)`` as a nested-dict pytree, and computation happens
in ``apply(params, ...)``.

Metrics: instead of mutable counters on modules (reference
modulewithmetrics.py:28-64), task modules return ``(loss, metrics)`` where
``metrics`` is a dict of scalar *accumulator* arrays; the trainer sums these
across steps on host and asks the module to ``finalize_metrics`` (e.g. divide
a running f1 sum by a sample count). This keeps every step function pure.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax

Params = Dict[str, Any]


class Module:
    """Base class for functional neural modules.

    Subclasses set hyperparameters in ``__init__``, implement ``init`` to
    create a parameter pytree and ``apply`` to compute. ``apply`` receives
    ``train`` (static bool) and, when stochastic, an ``rng`` key.
    """

    def init(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def apply(self, params: Params, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, params: Params, *args, **kwargs):
        return self.apply(params, *args, **kwargs)

    # -- metrics protocol -------------------------------------------------
    def finalize_metrics(self, accumulated: Mapping[str, Any]) -> Dict[str, Any]:
        """Turn summed metric accumulators into reported metrics.

        Mirrors the reference's ModuleWithMetrics.report_metrics aggregation
        (reference: ptgnn/baseneuralmodel/modulewithmetrics.py:28-48) but as a
        pure host-side post-processing step.
        """
        return dict(accumulated)


def fold(rng: Optional[jax.Array], index: int) -> Optional[jax.Array]:
    """Derive a child rng deterministically; passes None through.

    Used by parent modules to hand independent keys to children without
    global state. ``index`` must be a static Python int.
    """
    if rng is None:
        return None
    return jax.random.fold_in(rng, index)


def split_init(key: jax.Array, n: int):
    """Split an init key into n independent keys."""
    return jax.random.split(key, n)
