"""Single-device training loop with a jitted train step.

Mirrors the reference ModelTrainer (trainer.py:31-471): metadata pass ->
build module -> Adam -> epoch loop with NaN-loss guard, grad-norm clipping,
per-step scheduler, validation-driven early stopping and best-checkpoint
save/restore, plus the five hook families. TPU-first differences:

* the whole optimization step is ONE compiled XLA program (loss + grads +
  clip + Adam update) over the statically shaped batch, so steps have no
  Python in the hot path besides host batch assembly;
* AMP = bf16 compute with fp32 master weights and fp32 segment/layernorm
  accumulation (no GradScaler: bf16 keeps fp32's exponent range);
* metrics are pure accumulators summed on host (see core/metrics.py).

The neural-module protocol: ``module.apply(params, **minibatch, train=...,
rng=...)`` returns ``(loss, metrics_dict)``.
"""
from __future__ import annotations

import json
import logging
import math
import random
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ptgnn_tpu.core import checkpoint as ckpt
from ptgnn_tpu.core.data import MemorizedDataIterable
from ptgnn_tpu.core.metrics import MetricsAccumulator
from ptgnn_tpu.core.model import AbstractNeuralModel

__all__ = ["ModelTrainer", "AbstractScheduler", "EndOfEpochHook"]

EndOfEpochHook = Callable[[AbstractNeuralModel, Any, int, Dict], None]


class AbstractScheduler(Protocol):
    """Learning-rate schedule queried per step (reference: trainer.py:26-28).

    Returns a multiplicative factor applied to the optimizer's base update.
    """

    def step(self, epoch_idx: int, epoch_step: int) -> float:
        ...


def _prefetch_device_batches(iterator, size: int, catch_oom: bool = False):
    """Keep ``size`` minibatches in flight on the device.

    JAX transfers are asynchronous, so issuing the NEXT batch's device_put
    before consuming the current one overlaps host->device copies with the
    running step instead of paying them on the step's critical path.
    Yields the same (minibatch, raw_samples) pairs, in order.

    ``catch_oom``: a RESOURCE_EXHAUSTED raised by the transfer itself skips
    that batch (matching catch_device_ooms semantics — this generator runs
    outside the step loop's try block)."""
    from collections import deque

    from ptgnn_tpu.utils.oom import is_oom_error

    buf = deque()
    for mb, raw in iterator:
        try:
            buf.append((jax.device_put(mb), raw))
        except RuntimeError as error:
            if not (catch_oom and is_oom_error(error)):
                raise
            logging.getLogger(__name__).exception(
                "Device OOM while prefetching a minibatch; skipping it."
            )
            continue
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def _cast_floats(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


class ModelTrainer:
    LOGGER = logging.getLogger(__name__)

    def __init__(
        self,
        model: AbstractNeuralModel,
        checkpoint_location: Path,
        *,
        max_num_epochs: int = 100,
        minibatch_size: int = 200,
        optimizer_creator: Optional[Callable[[], optax.GradientTransformation]] = None,
        scheduler_creator: Optional[Callable[[], AbstractScheduler]] = None,
        clip_gradient_norm: Optional[float] = None,
        target_validation_metric: Optional[str] = None,
        target_validation_metric_higher_is_better: bool = False,
        enable_amp: bool = False,
        catch_device_ooms: bool = False,
        gradient_accumulation_steps: int = 1,
        prefetch_to_device: int = 2,
        seed: int = 0,
    ):
        self._model = model
        self._params = None
        self._neural_module = None
        self._checkpoint_location = Path(checkpoint_location)
        self._max_num_epochs = max_num_epochs
        self._minibatch_size = minibatch_size
        self._optimizer_creator = optimizer_creator or (lambda: optax.adam(1e-3))
        self._scheduler_creator = scheduler_creator
        self._clip_gradient_norm = clip_gradient_norm
        self._enable_amp = enable_amp
        self._catch_device_ooms = catch_device_ooms
        assert gradient_accumulation_steps >= 1
        self._grad_accum_steps = gradient_accumulation_steps
        self._grad_accum_state = None  # (grad_tree, count) between microbatches
        self._opt_steps_this_epoch = 0  # schedule index; reset per epoch
        assert prefetch_to_device >= 1
        self._prefetch_to_device = prefetch_to_device
        self._seed = seed

        self._metadata_finalized_hooks: List[Callable[[AbstractNeuralModel], None]] = []
        self._training_start_hooks: List[Callable[[AbstractNeuralModel, Any, Any], None]] = []
        self._train_epoch_end_hooks: List[EndOfEpochHook] = []
        self._validation_epoch_end_hooks: List[EndOfEpochHook] = []
        self._improved_epoch_end_hooks: List[EndOfEpochHook] = []

        self._target_metric = target_validation_metric
        if target_validation_metric is not None:
            self._target_metric_higher_is_better = target_validation_metric_higher_is_better
        else:
            assert not target_validation_metric_higher_is_better, (
                "When no explicit metric is passed, the validation loss will be used."
            )
            self._target_metric_higher_is_better = False

        self._train_step_fn = None
        self._eval_step_fn = None
        self._start_epoch_override: Optional[int] = None
        self._restored_opt_state = None

    # ------------------------------------------------------------------
    @property
    def model(self) -> AbstractNeuralModel:
        return self._model

    @property
    def neural_module(self):
        if self._neural_module is None:
            raise Exception("Neural module has not been built.")
        return self._neural_module

    @neural_module.setter
    def neural_module(self, module):
        self._neural_module = module

    @property
    def params(self):
        if self._params is None:
            raise Exception("Parameters have not been initialized.")
        return self._params

    @params.setter
    def params(self, params):
        self._params = params

    # ------------------------------------------------------------------
    # Hooks (reference: trainer.py:172-187)
    # ------------------------------------------------------------------
    def register_model_metadata_finalized_hook(self, hook) -> None:
        self._metadata_finalized_hooks.append(hook)

    def register_training_start_hook(self, hook) -> None:
        self._training_start_hooks.append(hook)

    def register_train_epoch_end_hook(self, hook: EndOfEpochHook) -> None:
        self._train_epoch_end_hooks.append(hook)

    def register_validation_epoch_end_hook(self, hook: EndOfEpochHook) -> None:
        self._validation_epoch_end_hooks.append(hook)

    def register_epoch_improved_end_hook(self, hook: EndOfEpochHook) -> None:
        self._improved_epoch_end_hooks.append(hook)

    # ------------------------------------------------------------------
    # Setup
    # ------------------------------------------------------------------
    def load_metadata_and_create_network(
        self, training_data: Iterable, parallelize: bool = True, show_progress_bar: bool = False
    ) -> None:
        # Models arriving pre-initialized (e.g. retuned by
        # utils/autotune.autotune_task_model, which computes metadata for its
        # measurement pass) skip the second data scan.
        if not self._model.metadata_initialized:
            self._model.compute_metadata(iter(training_data), parallelize)
        self._neural_module = self._model.build_neural_module()
        self._params = self._neural_module.init(jax.random.PRNGKey(self._seed))
        num_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self._params)
        )
        self.LOGGER.info("Model metadata loaded; %s trainable parameters.", num_params)
        for m in self._metadata_finalized_hooks:
            m(self._model)
        self.LOGGER.info(
            "Model Definition:\n %s", json.dumps(dict(self._model.model_definition), indent=2)
        )
        self._save_checkpoint()

    def restore_parameters(self, path: Optional[Path] = None, restore_optimizer: bool = False):
        """Resume support (reference: typilus/train.py:154-180)."""
        path = Path(path) if path is not None else self._checkpoint_location
        _, params = self._model.restore_model(path)
        self._neural_module = self._model.build_neural_module()
        self._params = params
        if restore_optimizer:
            opt_path = path.with_suffix(".optimizerstate")
            if opt_path.exists():
                opt_state, epoch, _ = ckpt.load_optimizer_state(opt_path)
                self._restored_opt_state = opt_state
                self._start_epoch_override = epoch

    def _save_checkpoint(self) -> None:
        self._model.save(self._checkpoint_location, self._params)

    def _save_optimizer_state(self, opt_state, next_epoch: int) -> None:
        """Per-epoch optimizer-state checkpoint (reference: trainer.py:436-439).
        Overridden by the distributed trainer for coordinator-only writes."""
        ckpt.save_optimizer_state(
            self._checkpoint_location.with_suffix(".optimizerstate"), opt_state, next_epoch
        )

    def _restore_checkpoint(self) -> None:
        if not self._checkpoint_location.exists():
            # Restored-model runs skip the initial metadata checkpoint; if no
            # epoch ever improved, there is nothing at this path — keep the
            # current (restored) parameters instead of crashing at the very
            # end of training.
            self.LOGGER.warning(
                "No checkpoint at %s (no epoch improved on the starting "
                "model); keeping current parameters.",
                self._checkpoint_location,
            )
            return
        _, self._params = self._model.restore_model(self._checkpoint_location)

    # ------------------------------------------------------------------
    # Compiled steps
    # ------------------------------------------------------------------
    def _init_opt_state(self, optimizer: optax.GradientTransformation):
        """Fresh (or restored) optimizer state. The distributed trainer
        overrides this to materialize ZeRO-1-sharded moments directly."""
        opt_state = optimizer.init(self._params)
        if self._restored_opt_state is not None:
            opt_state = jax.tree_util.tree_map(
                lambda tmpl, restored: jnp.asarray(restored),
                opt_state,
                self._restored_opt_state,
            )
            self._restored_opt_state = None
        return opt_state

    def _build_step_functions(self, optimizer: optax.GradientTransformation):
        module = self.neural_module
        amp = self._enable_amp

        def loss_fn(params, minibatch, rng):
            if amp:
                params = _cast_floats(params, jnp.bfloat16)
                minibatch = _cast_floats(minibatch, jnp.bfloat16)
            loss, metrics = module.apply(params, **minibatch, train=True, rng=rng)
            return loss.astype(jnp.float32), metrics

        def train_step(params, opt_state, minibatch, rng, lr_factor):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, minibatch, rng
            )
            grads = _cast_floats(grads, jnp.float32)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr_factor, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, metrics

        def eval_step(params, minibatch):
            if amp:
                params = _cast_floats(params, jnp.bfloat16)
                minibatch = _cast_floats(minibatch, jnp.bfloat16)
            loss, metrics = module.apply(params, **minibatch, train=False)
            return loss.astype(jnp.float32), metrics

        self._train_step_fn = jax.jit(train_step)
        self._eval_step_fn = jax.jit(eval_step)

        if self._grad_accum_steps > 1:
            self._build_accumulating_step(optimizer, loss_fn)

    def _build_accumulating_step(self, optimizer, loss_fn):
        """Gradient accumulation: every k-th microbatch applies the mean of
        the last k gradients; the others only add to a device-resident
        accumulator. Large effective batches without the memory (and, on
        this stack, the superlinear irregular-op cost) of a large padded
        batch — compose with the tuned per-step batch size instead.
        """
        k = self._grad_accum_steps

        def grad_step(params, grad_acc, minibatch, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, minibatch, rng
            )
            grads = _cast_floats(grads, jnp.float32)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            return grad_acc, loss, metrics

        def apply_step(params, opt_state, grad_acc, count, lr_factor):
            grads = jax.tree_util.tree_map(
                lambda g: g / jnp.maximum(count, 1.0), grad_acc
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr_factor, updates)
            return optax.apply_updates(params, updates), opt_state

        grad_step_j = jax.jit(grad_step, donate_argnums=(1,))
        apply_step_j = jax.jit(apply_step)

        def zeros_like_grads(params):
            return jax.tree_util.tree_map(
                lambda p: jnp.zeros(jnp.shape(p), jnp.float32)
                if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating)
                else jnp.zeros(jnp.shape(p), jnp.asarray(p).dtype),
                params,
            )

        def accumulating_train_step(params, opt_state, minibatch, rng, lr_factor):
            acc, count = self._grad_accum_state or (zeros_like_grads(params), 0)
            try:
                acc, loss, metrics = grad_step_j(params, acc, minibatch, rng)
                # Surface lazy device errors (RESOURCE_EXHAUSTED) HERE: the
                # previous accumulator was donated into this call, so a
                # failure that escaped to the epoch loop's catch would leave
                # self._grad_accum_state pointing at poisoned buffers.
                float(loss)
            except RuntimeError:
                # Drop the whole partial group — its prior microbatches'
                # gradients lived in the donated accumulator.
                self._grad_accum_state = None
                raise
            count += 1
            if count >= k:
                try:
                    params, opt_state = apply_step_j(
                        params, opt_state, acc, jnp.float32(count), lr_factor
                    )
                    if self._catch_device_ooms:
                        # surface an async apply-step OOM here, NOT at the
                        # next microbatch's sync, where the poisoned params
                        # would already be committed to the epoch loop
                        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
                except RuntimeError:
                    self._grad_accum_state = None
                    raise
                self._grad_accum_state = None
                self._opt_steps_this_epoch += 1
            else:
                self._grad_accum_state = (acc, count)
                self._last_lr_factor = lr_factor
            return params, opt_state, loss, metrics

        self._train_step_fn = accumulating_train_step
        self._apply_accum_fn = apply_step_j

    def _flush_accumulated_grads(self, opt_state):
        """Apply a trailing partial accumulation group (end of epoch)."""
        if getattr(self, "_grad_accum_state", None) is None:
            return opt_state
        acc, count = self._grad_accum_state
        self._grad_accum_state = None
        self._params, opt_state = self._apply_accum_fn(
            self._params, opt_state, acc, jnp.float32(count),
            getattr(self, "_last_lr_factor", 1.0),
        )
        self._opt_steps_this_epoch += 1
        return opt_state

    # ------------------------------------------------------------------
    # Epoch loops
    # ------------------------------------------------------------------
    def _run_training(
        self, training_tensors, epoch, optimizer, opt_state, scheduler, parallelize,
        shuffle_input=True, show_progress_bar=False,
    ):
        sum_epoch_loss, num_minibatches, num_samples = 0.0, 0, 0
        metrics_acc = MetricsAccumulator()
        start_time = time.time()
        rng = jax.random.PRNGKey(self._seed * 1_000_003 + epoch)
        params = self._params
        # optimizer-step index for schedules: under gradient accumulation the
        # wrapper increments this once per APPLY (OOM-skipped microbatches
        # must not advance the schedule)
        self._opt_steps_this_epoch = 0
        progress = None
        ema_loss = None
        if show_progress_bar:
            try:
                from tqdm import tqdm

                progress = tqdm(desc=f"epoch {epoch + 1}", unit="mb", leave=False)
            except ImportError:  # pragma: no cover
                progress = None
        mb_iter = self._model.minibatch_iterator(
            training_tensors(),
            max_minibatch_size=self._minibatch_size,
            yield_partial_minibatches=False,
            shuffle_input=shuffle_input,
            parallelize=parallelize,
            # data order is part of the training seed: same seed -> same run
            shuffle_rng=random.Random(self._seed * 1_000_003 + epoch),
        )
        if self._prefetch_to_device > 1:
            mb_iter = _prefetch_device_batches(
                mb_iter, self._prefetch_to_device,
                catch_oom=self._catch_device_ooms,
            )
        from ptgnn_tpu.utils.oom import is_oom_error

        for step_idx, (mb_data, raw_samples) in enumerate(mb_iter):
            # Schedules are in OPTIMIZER-step units (core/schedulers.py):
            # under gradient accumulation k microbatches share one index,
            # counted by actual applies so OOM skips don't advance it.
            lr_factor = (
                1.0
                if scheduler is None
                else scheduler.step(
                    epoch,
                    self._opt_steps_this_epoch
                    if self._grad_accum_steps > 1
                    else step_idx,
                )
            )
            try:
                new_params, new_opt_state, loss, metrics = self._train_step_fn(
                    params, opt_state, mb_data, jax.random.fold_in(rng, step_idx), lr_factor
                )
                # The step dispatches asynchronously; a device OOM
                # (RESOURCE_EXHAUSTED) only surfaces at the first host sync.
                # Read the loss here so it raises inside this block, and keep
                # the step's outputs out of (params, opt_state) until it
                # succeeds — no donation on the jit, so the inputs survive.
                loss_f = float(loss)
            except RuntimeError as error:
                if not (self._catch_device_ooms and is_oom_error(error)):
                    raise
                # Genuinely skip the minibatch: no loss/metrics accounting
                # happens for it (reference keeps all accounting inside the
                # catch block, trainer.py:220-254).
                self.LOGGER.exception(
                    "A device OOM error was caught; skipping minibatch."
                )
                continue
            params, opt_state = new_params, new_opt_state
            if self._grad_accum_steps == 1:
                self._opt_steps_this_epoch += 1
            # NaN guard (reference: trainer.py:226). loss_f is already the
            # synced host value, so the check is free and immediate.
            if not np.isfinite(loss_f):
                raise Exception("Loss has a NaN value.")
            sum_epoch_loss += loss_f
            num_minibatches += 1
            num_samples += len(raw_samples)
            metrics_acc.update(metrics)
            if progress is not None:
                # EMA display matching the reference (trainer.py:206,244-254)
                ema_loss = loss_f if ema_loss is None else 0.97 * ema_loss + 0.03 * loss_f
                progress.update(1)
                progress.set_postfix(loss=f"{ema_loss:.3f}")
        if progress is not None:
            progress.close()
        self._params = params
        if self._grad_accum_steps > 1:
            opt_state = self._flush_accumulated_grads(opt_state)
            params = self._params

        elapsed = time.time() - start_time
        assert num_minibatches > 0, (
            "No training minibatches were created. The minibatch size may be too large "
            "or the training dataset size too small."
        )
        self.LOGGER.info(
            "Training complete in %.1fsec [%.2f samples/sec]", elapsed, num_samples / elapsed
        )
        self.LOGGER.info("Epoch %i: Train Loss %.2f", epoch + 1, sum_epoch_loss / num_minibatches)
        train_metrics = self.neural_module.finalize_metrics(metrics_acc.totals())
        train_metrics["_throughput"] = {
            "samples_per_sec": num_samples / elapsed,
            **{
                f"{k}_per_sec": metrics_acc.totals()[k] / elapsed
                for k in ("num_graphs", "num_nodes", "num_edges")
                if k in metrics_acc.totals()
            },
        }
        for hook in self._train_epoch_end_hooks:
            hook(self._model, self.neural_module, epoch, train_metrics)
        if train_metrics:
            self.LOGGER.info("Training Metrics: %s", json.dumps(train_metrics, indent=2))
        return opt_state

    def _run_validation(self, validation_tensors, epoch, best_target_metric, parallelize):
        sum_epoch_loss, num_minibatches, num_samples = 0.0, 0, 0
        metrics_acc = MetricsAccumulator()
        start_time = time.time()
        for mb_data, raw_samples in self._model.minibatch_iterator(
            validation_tensors(),
            max_minibatch_size=self._minibatch_size,
            yield_partial_minibatches=True,
            shuffle_input=False,
            parallelize=parallelize,
        ):
            loss, metrics = self._eval_step_fn(self._params, mb_data)
            sum_epoch_loss += float(loss)
            num_minibatches += 1
            num_samples += len(raw_samples)
            metrics_acc.update(metrics)
        elapsed = time.time() - start_time
        assert num_samples > 0, "No validation data was found."
        validation_loss = sum_epoch_loss / num_minibatches
        self.LOGGER.info(
            "Validation complete in %.1fsec [%.2f samples/sec]", elapsed, num_samples / elapsed
        )
        self.LOGGER.info("Epoch %i: Valid Loss %.2f", epoch + 1, validation_loss)

        validation_metrics = self.neural_module.finalize_metrics(metrics_acc.totals())
        for hook in self._validation_epoch_end_hooks:
            hook(self._model, self.neural_module, epoch, validation_metrics)
        if validation_metrics:
            self.LOGGER.info("Validation Metrics: %s", json.dumps(validation_metrics, indent=2))

        if self._target_metric is not None:
            target_metric = validation_metrics[self._target_metric]
        else:
            target_metric = validation_loss
        if self._target_metric_higher_is_better:
            improved = target_metric > best_target_metric
        else:
            improved = target_metric < best_target_metric
        return target_metric, improved, validation_metrics

    # ------------------------------------------------------------------
    def train(
        self,
        training_data: Iterable,
        validation_data: Iterable,
        *,
        validate_on_start: bool = True,
        patience: int = 5,
        initialize_metadata: bool = True,
        parallelize: bool = True,
        use_multiprocessing: bool = True,
        store_tensorized_data_in_memory: bool = False,
        shuffle_training_data: bool = True,
        start_epoch_idx: int = 0,
        show_progress_bar: bool = False,
    ) -> None:
        if initialize_metadata:
            self.load_metadata_and_create_network(training_data, parallelize, show_progress_bar)

        training_tensors = lambda: self._model.tensorize_dataset(
            iter(training_data), parallelize=parallelize, use_multiprocessing=use_multiprocessing
        )
        validation_tensors = lambda: self._model.tensorize_dataset(
            iter(validation_data), parallelize=parallelize, use_multiprocessing=use_multiprocessing
        )
        if store_tensorized_data_in_memory:
            training_tensors = MemorizedDataIterable(
                training_tensors, shuffle=True, rng=random.Random(self._seed)
            )
            validation_tensors = MemorizedDataIterable(validation_tensors)

        optimizer = self._optimizer_creator()
        if self._clip_gradient_norm is not None:
            optimizer = optax.chain(
                optax.clip_by_global_norm(self._clip_gradient_norm), optimizer
            )
        # Step functions first: the distributed trainer's _init_opt_state
        # materializes ZeRO-1-sharded moments through the mesh built here.
        self._build_step_functions(optimizer)
        opt_state = self._init_opt_state(optimizer)
        if self._start_epoch_override is not None:
            start_epoch_idx = max(start_epoch_idx, self._start_epoch_override)
            self._start_epoch_override = None
        scheduler = None if self._scheduler_creator is None else self._scheduler_creator()

        for hook in self._training_start_hooks:
            hook(self._model, self.neural_module, optimizer)

        if self._target_metric_higher_is_better and self._target_metric is not None:
            best_target_metric = -math.inf
        else:
            best_target_metric = math.inf

        if validate_on_start:
            target_metric, improved, _ = self._run_validation(
                validation_tensors, start_epoch_idx, best_target_metric, parallelize
            )
            assert improved
            self.LOGGER.info("Initial %s: %s", self._target_metric or "Loss", target_metric)
            best_target_metric = target_metric

        num_epochs_not_improved = 0
        for epoch in range(start_epoch_idx, self._max_num_epochs):
            opt_state = self._run_training(
                training_tensors, epoch, optimizer, opt_state, scheduler,
                parallelize, shuffle_training_data, show_progress_bar,
            )
            self._save_optimizer_state(opt_state, epoch + 1)
            target_metric, improved, validation_metrics = self._run_validation(
                validation_tensors, epoch, best_target_metric, parallelize
            )
            if improved:
                self.LOGGER.info(
                    "Best performance so far (%s: %.3f from %.3f). Saving model checkpoint.",
                    self._target_metric or "Loss", target_metric, best_target_metric,
                )
                num_epochs_not_improved = 0
                self._save_checkpoint()
                best_target_metric = target_metric
                for hook in self._improved_epoch_end_hooks:
                    hook(self._model, self.neural_module, epoch, validation_metrics)
            else:
                num_epochs_not_improved += 1
                if num_epochs_not_improved > patience:
                    self.LOGGER.warning(
                        "The target metric has not improved for %s epochs. Stopping.",
                        num_epochs_not_improved,
                    )
                    break
        # Restore the best parameters found.
        self._restore_checkpoint()
