"""LR schedules for the AbstractScheduler protocol (core/schedulers.py) and
the device prefetch iterator (core/trainer.py)."""
import numpy as np

from ptgnn_tpu.core.schedulers import (
    ConstantScheduler,
    LinearWarmupScheduler,
    StepDecayScheduler,
    WarmupCosineScheduler,
)
from ptgnn_tpu.core.trainer import _prefetch_device_batches


def test_constant():
    s = ConstantScheduler(0.5)
    assert s.step(0, 0) == 0.5 and s.step(9, 99) == 0.5


def test_linear_warmup():
    s = LinearWarmupScheduler(warmup_steps=4, steps_per_epoch=10)
    assert s.step(0, 0) == 0.25
    assert s.step(0, 3) == 1.0
    assert s.step(5, 7) == 1.0  # long past warmup


def test_warmup_cosine_shape():
    s = WarmupCosineScheduler(
        warmup_steps=10, total_steps=110, steps_per_epoch=10, final_factor=0.1
    )
    # warmup ramps
    assert s.step(0, 0) < s.step(0, 5) < s.step(0, 9) == 1.0
    # decays monotonically after warmup
    vals = [s.step(e, t) for e in range(1, 11) for t in range(10)]
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))
    # lands on the floor at total_steps and stays there
    np.testing.assert_allclose(s.step(11, 0), 0.1, atol=1e-6)
    assert s.step(50, 0) == 0.1


def test_step_decay():
    s = StepDecayScheduler(gamma=0.1, epochs_per_decay=2)
    assert s.step(0, 0) == 1.0 and s.step(1, 5) == 1.0
    np.testing.assert_allclose(s.step(2, 0), 0.1)
    np.testing.assert_allclose(s.step(5, 3), 0.01)


def test_scheduler_steps_in_optimizer_units_under_accumulation(tmp_path):
    """With gradient_accumulation_steps=k the schedule index must advance
    once per OPTIMIZER step, not once per microbatch."""
    import optax

    from ptgnn_tpu.core import LazyDataIterable, ModelTrainer
    from tests.test_trainer_lifecycle import SimpleRegressionModel, synthetic_data

    calls = []

    class Recording:
        def step(self, epoch_idx, epoch_step):
            calls.append((epoch_idx, epoch_step))
            return 1.0

    data = synthetic_data(np.random.RandomState(5), 640)
    trainer = ModelTrainer(
        SimpleRegressionModel(),
        tmp_path / "m.pkl.gz",
        max_num_epochs=1,
        minibatch_size=64,
        gradient_accumulation_steps=2,
        optimizer_creator=lambda: optax.sgd(0.01),
        scheduler_creator=Recording,
    )
    trainer.train(
        LazyDataIterable(lambda: iter(data)),
        LazyDataIterable(lambda: iter(data)),
        parallelize=False,
        validate_on_start=False,
        patience=2,
    )
    steps = [t for e, t in calls if e == 0]
    assert steps, calls
    # 10 microbatches at k=2 -> optimizer-step indices 0,0,1,1,...,4,4
    assert max(steps) == (len(steps) - 1) // 2, steps
    assert steps == [i // 2 for i in range(len(steps))], steps


def test_prefetch_preserves_order_and_content():
    items = [({"x": np.full((3,), i, np.float32)}, [f"raw{i}"]) for i in range(7)]
    out = list(_prefetch_device_batches(iter(items), size=3))
    assert len(out) == 7
    for i, (mb, raw) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(mb["x"]), np.full((3,), i))
        assert raw == [f"raw{i}"]


def test_prefetch_short_stream():
    items = [({"x": np.zeros(1)}, [0])]
    assert len(list(_prefetch_device_batches(iter(items), size=4))) == 1
    assert list(_prefetch_device_batches(iter([]), size=2)) == []
