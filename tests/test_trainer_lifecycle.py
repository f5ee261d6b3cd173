"""End-to-end trainer lifecycle test on a synthetic linearly separable task.

Replicates the reference's only test suite (ptgnn/tests/simplemodel): train a
minimal AbstractNeuralModel under the three data-pipeline modes, assert
accuracy > 0.95 within the epoch budget, and assert save/restore determinism
(test_model.py:35-91).
"""
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
import pytest

from ptgnn_tpu.core import AbstractNeuralModel, LazyDataIterable, ModelTrainer
from ptgnn_tpu.nn import Linear, Module


def synthetic_data(rng: np.random.RandomState, n: int, dim: int = 16):
    # one fixed ground-truth hyperplane across folds (reference: simplemodel/data.py)
    w = np.random.RandomState(7).randn(dim)
    xs = rng.randn(n, dim).astype(np.float32)
    ys = (xs @ w > 0).astype(np.float32)
    return [(x, y) for x, y in zip(xs, ys)]


class SimpleRegressionModule(Module):
    def __init__(self, dim: int):
        self.linear = Linear(dim, 1)

    def init(self, key):
        return {"linear": self.linear.init(key)}

    def apply(self, params, features, targets, *, train=False, rng=None):
        logits = self.linear.apply(params["linear"], features).squeeze(-1)
        loss = jnp.mean(
            jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        correct = jnp.sum((logits > 0) == (targets > 0.5))
        return loss, {"num_correct": correct, "num_samples": targets.shape[0]}

    def finalize_metrics(self, acc: Dict[str, float]) -> Dict[str, Any]:
        out = dict(acc)
        if acc.get("num_samples"):
            out["accuracy"] = acc["num_correct"] / acc["num_samples"]
        return out


class SimpleRegressionModel(AbstractNeuralModel):
    def initialize_metadata(self):
        self.__dim = None

    def update_metadata_from(self, datapoint):
        self.__dim = datapoint[0].shape[0]

    def build_neural_module(self):
        return SimpleRegressionModule(self.__dim)

    def tensorize(self, datapoint):
        return datapoint

    def initialize_minibatch(self):
        return {"features": [], "targets": []}

    def extend_minibatch_with(self, tensorized_datapoint, partial_minibatch):
        partial_minibatch["features"].append(tensorized_datapoint[0])
        partial_minibatch["targets"].append(tensorized_datapoint[1])
        return len(partial_minibatch["features"]) < 64

    def finalize_minibatch(self, accumulated):
        # static shape: pad to the fixed minibatch budget; empty input makes
        # a fully masked padding batch (used by the distributed trainers)
        n = len(accumulated["features"])
        dim = accumulated["features"][0].shape[0] if n else self._SimpleRegressionModel__dim
        feats = np.zeros((64, dim), np.float32)
        targets = np.zeros(64, np.float32)
        if n:
            feats[:n] = np.stack(accumulated["features"])
            targets[:n] = np.asarray(accumulated["targets"])
            # pad with copies of row 0 so padded rows don't perturb the loss scale
            feats[n:] = feats[0]
            targets[n:] = targets[0]
        return {"features": feats, "targets": targets}

    def compute_accuracy(self, data, params, module) -> float:
        correct = total = 0
        for mb, raw in self.minibatch_iterator(
            self.tensorize_dataset(iter(data), parallelize=False),
            max_minibatch_size=64,
            parallelize=False,
        ):
            logits = np.asarray(
                module.linear.apply(params["linear"], jnp.asarray(mb["features"]))
            ).squeeze(-1)
            n = len(raw)
            correct += int(((logits[:n] > 0) == (mb["targets"][:n] > 0.5)).sum())
            total += n
    # note: deliberately simple; padding rows excluded via raw count
        return correct / total


@pytest.mark.parametrize(
    "parallelize,use_multiprocessing",
    [(True, True), (True, False), (False, False)],
    ids=["parallel", "parallel_no_multiprocessing", "sequential"],
)
def test_train_save_restore(tmp_path, parallelize, use_multiprocessing):
    rng = np.random.RandomState(42)
    train = synthetic_data(rng, 4000)
    valid = synthetic_data(np.random.RandomState(1), 500)

    model = SimpleRegressionModel()
    path = tmp_path / "model.pkl.gz"
    trainer = ModelTrainer(model, path, max_num_epochs=20, minibatch_size=64)
    trainer.train(
        LazyDataIterable(lambda: iter(train)),
        LazyDataIterable(lambda: iter(valid)),
        parallelize=parallelize,
        use_multiprocessing=use_multiprocessing,
        patience=10,
    )
    module = trainer.neural_module
    acc = model.compute_accuracy(valid, trainer.params, module)
    assert acc > 0.95, f"accuracy {acc} too low"

    # save/restore determinism (reference: test_model.py:82-87)
    restored_model, restored_params = SimpleRegressionModel.restore_model(path)
    acc2 = restored_model.compute_accuracy(
        valid, restored_params, restored_model.build_neural_module()
    )
    assert round(acc, 3) == round(acc2, 3)


class NanModule(SimpleRegressionModule):
    def apply(self, params, features, targets, *, train=False, rng=None):
        loss, m = super().apply(params, features, targets, train=train, rng=rng)
        return loss * jnp.nan, m


class NanModel(SimpleRegressionModel):
    def build_neural_module(self):
        return NanModule(16)


def test_nan_loss_aborts(tmp_path):
    data = synthetic_data(np.random.RandomState(0), 300)
    trainer = ModelTrainer(NanModel(), tmp_path / "m.pkl.gz", max_num_epochs=2, minibatch_size=64)
    with pytest.raises(Exception, match="NaN"):
        trainer.train(
            LazyDataIterable(lambda: iter(data)),
            LazyDataIterable(lambda: iter(data)),
            parallelize=False,
            validate_on_start=False,
        )


def test_optimizer_state_resume(tmp_path):
    data = synthetic_data(np.random.RandomState(3), 1000)
    import optax
    model = SimpleRegressionModel()
    path = tmp_path / "model.pkl.gz"
    fast_adam = lambda: optax.adam(1e-2)
    trainer = ModelTrainer(model, path, max_num_epochs=3, minibatch_size=64,
                           optimizer_creator=fast_adam)
    trainer.train(
        LazyDataIterable(lambda: iter(data)),
        LazyDataIterable(lambda: iter(data)),
        parallelize=False,
        validate_on_start=False,
        patience=10,
    )
    assert path.with_suffix(".optimizerstate").exists()

    model2, _ = SimpleRegressionModel.restore_model(path)
    trainer2 = ModelTrainer(model2, path, max_num_epochs=8, minibatch_size=64,
                            optimizer_creator=fast_adam)
    trainer2.restore_parameters(path, restore_optimizer=True)
    trainer2.train(
        LazyDataIterable(lambda: iter(data)),
        LazyDataIterable(lambda: iter(data)),
        parallelize=False,
        initialize_metadata=False,
        validate_on_start=False,
        patience=10,
    )
    acc = model2.compute_accuracy(data, trainer2.params, trainer2.neural_module)
    assert acc > 0.9


class _OomInjectingTrainer(ModelTrainer):
    """Raises a RESOURCE_EXHAUSTED RuntimeError on selected train steps."""

    def __init__(self, *args, fail_steps=(0,), **kwargs):
        super().__init__(*args, **kwargs)
        self._fail_steps = set(fail_steps)
        self.steps_attempted = 0
        self.steps_failed = 0

    def _build_step_functions(self, optimizer):
        super()._build_step_functions(optimizer)
        inner = self._train_step_fn

        def failing_step(*args, **kwargs):
            idx = self.steps_attempted
            self.steps_attempted += 1
            if idx in self._fail_steps:
                self.steps_failed += 1
                raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory while running")
            return inner(*args, **kwargs)

        self._train_step_fn = failing_step


def test_oom_step_is_skipped(tmp_path):
    """catch_device_ooms=True must genuinely skip the minibatch: no stale
    loss/metrics accounting, no NameError on a first-step OOM (reference
    keeps accounting inside the catch block, trainer.py:220-254)."""
    data = synthetic_data(np.random.RandomState(5), 2000)
    import optax

    trainer = _OomInjectingTrainer(
        SimpleRegressionModel(),
        tmp_path / "m.pkl.gz",
        max_num_epochs=3,
        minibatch_size=64,
        catch_device_ooms=True,
        optimizer_creator=lambda: optax.adam(1e-2),
        fail_steps=(0, 5),  # first-ever step (loss unbound) + a mid-epoch step
    )
    trainer.train(
        LazyDataIterable(lambda: iter(data)),
        LazyDataIterable(lambda: iter(data)),
        parallelize=False,
        validate_on_start=False,
        patience=10,
    )
    assert trainer.steps_failed == 2
    acc = trainer.model.compute_accuracy(data, trainer.params, trainer.neural_module)
    assert acc > 0.9


class _LazyOomLoss:
    """Mimics an async JAX array whose RESOURCE_EXHAUSTED only surfaces at
    the first host sync (float())."""

    def __float__(self):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory (deferred at sync)")


class _LazyOomInjectingTrainer(_OomInjectingTrainer):
    """The step call itself succeeds (async dispatch); the OOM surfaces when
    the trainer reads the loss."""

    def _build_step_functions(self, optimizer):
        ModelTrainer._build_step_functions(self, optimizer)
        inner = self._train_step_fn

        def failing_step(*args, **kwargs):
            idx = self.steps_attempted
            self.steps_attempted += 1
            params, opt_state, loss, metrics = inner(*args, **kwargs)
            if idx in self._fail_steps:
                self.steps_failed += 1
                return params, opt_state, _LazyOomLoss(), metrics
            return params, opt_state, loss, metrics

        self._train_step_fn = failing_step


def test_oom_at_lazy_sync_is_skipped(tmp_path):
    """Device OOM surfacing at the deferred sync point (float(loss)) must be
    caught by catch_device_ooms, not escape the guarded region."""
    data = synthetic_data(np.random.RandomState(5), 2000)
    import optax

    trainer = _LazyOomInjectingTrainer(
        SimpleRegressionModel(),
        tmp_path / "m.pkl.gz",
        max_num_epochs=3,
        minibatch_size=64,
        catch_device_ooms=True,
        optimizer_creator=lambda: optax.adam(1e-2),
        fail_steps=(0, 5),
    )
    trainer.train(
        LazyDataIterable(lambda: iter(data)),
        LazyDataIterable(lambda: iter(data)),
        parallelize=False,
        validate_on_start=False,
        patience=10,
    )
    assert trainer.steps_failed == 2
    acc = trainer.model.compute_accuracy(data, trainer.params, trainer.neural_module)
    assert acc > 0.9


def test_gradient_accumulation_matches_mean_gradient_step(tmp_path):
    """accum=2: the first microbatch must not touch params; the second must
    apply exactly one optimizer step on the MEAN of the two gradients."""
    import jax
    import optax

    data = synthetic_data(np.random.RandomState(3), 256)
    model = SimpleRegressionModel()
    trainer = ModelTrainer(
        model,
        tmp_path / "m.pkl.gz",
        gradient_accumulation_steps=2,
        optimizer_creator=lambda: optax.sgd(0.1),
    )
    trainer.load_metadata_and_create_network(data, parallelize=False)
    optimizer = optax.sgd(0.1)
    trainer._build_step_functions(optimizer)
    module = trainer.neural_module
    params0 = trainer.params
    mbs = [
        mb
        for mb, _ in model.minibatch_iterator(
            model.tensorize_dataset(iter(data), parallelize=False),
            max_minibatch_size=64,
            parallelize=False,
        )
    ][:2]
    opt_state = optimizer.init(params0)
    rngs = [jax.random.PRNGKey(1), jax.random.PRNGKey(2)]

    p, s, _, _ = trainer._train_step_fn(params0, opt_state, mbs[0], rngs[0], 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(params0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p, s, _, _ = trainer._train_step_fn(p, s, mbs[1], rngs[1], 1.0)

    def loss_fn(params, mb, rng):
        return module.apply(params, **mb, train=True, rng=rng)[0]

    g1 = jax.grad(loss_fn)(params0, mbs[0], rngs[0])
    g2 = jax.grad(loss_fn)(params0, mbs[1], rngs[1])
    gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
    updates, _ = optimizer.update(gm, optimizer.init(params0), params0)
    expected = optax.apply_updates(params0, updates)
    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_gradient_accumulation_trains(tmp_path):
    """End to end with an odd microbatch count per epoch (exercises the
    trailing-group flush) the model still learns."""
    import optax

    data = synthetic_data(np.random.RandomState(5), 2000)
    trainer = ModelTrainer(
        SimpleRegressionModel(),
        tmp_path / "m.pkl.gz",
        max_num_epochs=8,
        minibatch_size=64,  # 2000/64 -> 31 full minibatches: odd
        gradient_accumulation_steps=2,
        optimizer_creator=lambda: optax.adam(1e-2),
    )
    trainer.train(
        LazyDataIterable(lambda: iter(data)),
        LazyDataIterable(lambda: iter(data)),
        parallelize=False,
        validate_on_start=False,
        patience=10,
    )
    acc = trainer.model.compute_accuracy(data, trainer.params, trainer.neural_module)
    assert acc > 0.9


def test_oom_reraises_when_disabled(tmp_path):
    data = synthetic_data(np.random.RandomState(5), 300)
    trainer = _OomInjectingTrainer(
        SimpleRegressionModel(),
        tmp_path / "m.pkl.gz",
        max_num_epochs=1,
        minibatch_size=64,
        catch_device_ooms=False,
        fail_steps=(0,),
    )
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        trainer.train(
            LazyDataIterable(lambda: iter(data)),
            LazyDataIterable(lambda: iter(data)),
            parallelize=False,
            validate_on_start=False,
        )
