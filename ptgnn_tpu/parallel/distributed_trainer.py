"""Distributed (data-parallel) model trainer.

TPU-native counterpart of the reference's DistributedModelTrainer
(ptgnn/baseneuralmodel/distributedtrainer.py:28-397). Architectural deltas,
by design:

* Single-controller SPMD instead of ``mp.spawn`` + NCCL process groups: one
  Python process drives every local device through a ``Mesh``; multi-host
  runs start the same program per host after ``jax.distributed.initialize``
  (replacing the hardcoded localhost:12355 rendezvous,
  distributedtrainer.py:283-285).
* The gradient all-reduce is a ``psum`` inside ONE compiled step program
  (see parallel/dp.py) rather than DDP autograd hooks.
* Uneven inputs: instead of ``DDP.join(throw_on_early_termination=True)``
  (distributedtrainer.py:55), the final short group of minibatches is padded
  with fully masked empty batches — step counts agree across devices by
  construction, losses/metrics are weighted by real counts.
* ZeRO-1 (the reference's ZeroRedundancyOptimizer wrapper,
  typilus/traindistributed.py:50-72) is a sharding annotation on the Adam
  moments, not a wrapper class.
"""
from __future__ import annotations

import logging
import random
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh

from ptgnn_tpu.core.metrics import MetricsAccumulator
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.parallel.dp import DataParallel, stack_minibatches


def default_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


class DistributedModelTrainer(ModelTrainer):
    """ModelTrainer with the optimization step compiled as one SPMD program
    over a ``data`` mesh axis."""

    LOGGER = logging.getLogger(__name__)

    def __init__(self, *args, mesh: Optional[Mesh] = None, zero1: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self._mesh = mesh if mesh is not None else default_data_mesh()
        self._zero1 = zero1
        self._dp: Optional[DataParallel] = None
        self._empty_minibatch_template: Optional[Dict[str, Any]] = None
        self._globalized = False

    @property
    def num_devices(self) -> int:
        return self._mesh.shape["data"]

    @property
    def num_local_devices(self) -> int:
        """Mesh devices owned by this process (group size per host)."""
        return sum(
            1 for d in self._mesh.devices.flat
            if d.process_index == jax.process_index()
        )

    @property
    def is_coordinator(self) -> bool:
        return jax.process_index() == 0

    # ------------------------------------------------------------------
    def load_metadata_and_create_network(
        self, training_data, parallelize: bool = True, show_progress_bar: bool = False
    ) -> None:
        """Multi-host: ONLY the coordinator computes metadata (vocabularies,
        edge-type registries) and initializes parameters; the result is
        broadcast so every host compiles the same program over identical
        vocabularies — per-host metadata from rank-sharded files would
        diverge silently (the reference computes metadata once on rank 0
        before spawning, distributedtrainer.py:235-237)."""
        if jax.process_count() == 1:
            return super().load_metadata_and_create_network(
                training_data, parallelize, show_progress_bar
            )
        if self.is_coordinator:
            super().load_metadata_and_create_network(
                training_data, parallelize, show_progress_bar
            )
            payload = (self._model, jax.tree_util.tree_map(np.asarray, self._params))
        else:
            payload = None
        payload = self._broadcast_from_coordinator(payload)
        if not self.is_coordinator:
            model, params = payload
            self._model = model
            self._neural_module = model.build_neural_module()
            self._params = params

    @staticmethod
    def _broadcast_from_coordinator(obj):
        """Pickle-broadcast an object from process 0 to every host."""
        import pickle

        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            payload = np.frombuffer(pickle.dumps(obj), np.uint8)
        else:
            payload = np.zeros(0, np.uint8)
        n = int(
            multihost_utils.broadcast_one_to_all(np.asarray(len(payload), np.int64))
        )
        buf = np.zeros(n, np.uint8)
        buf[: len(payload)] = payload
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        return pickle.loads(buf.tobytes())

    def _init_opt_state(self, optimizer: optax.GradientTransformation):
        """Materialize the moments directly in their target (ZeRO-1)
        shardings: optimizer.init on raw params would build the full
        replicated state first — OOM in exactly the regime ZeRO-1 exists
        for — and step 1's sharding constraint would then force a second
        full compile of the donated train step."""
        params, _ = self._globalize(self.params, None)
        if jax.process_count() == 1:
            params = self._dp.device_put_params(params)
        opt_state = self._dp.init_opt_state(params)
        if self._restored_opt_state is not None:
            restored = self._restored_opt_state
            self._restored_opt_state = None
            if jax.process_count() == 1:
                opt_state = jax.tree_util.tree_map(
                    lambda tmpl, r: jax.device_put(np.asarray(r), tmpl.sharding),
                    opt_state, restored,
                )
            else:
                # Multi-host restore: place replicated (the consolidated
                # checkpoint holds full arrays per host); the step's
                # constraint reshards on the first update.
                opt_state = self._dp._put(
                    jax.tree_util.tree_map(np.asarray, restored),
                    self._dp.replicated(),
                )
        return opt_state

    def _build_step_functions(self, optimizer: optax.GradientTransformation):
        self._dp = DataParallel(
            self.neural_module,
            optimizer,
            self._mesh,
            enable_amp=self._enable_amp,
            zero1=self._zero1,
        )
        self._train_step_fn = self._dp.build_train_step()
        self._eval_step_fn = self._dp.build_eval_step()
        if self._grad_accum_steps > 1:
            self._build_dp_accumulating_step()

    def _build_dp_accumulating_step(self):
        """Wrap the SPMD step with gradient accumulation (ModelTrainer
        semantics: every k-th device group applies one optimizer step on the
        real-count-weighted mean of the accumulated gradients)."""
        import jax.numpy as jnp

        k = self._grad_accum_steps
        grad_step, apply_step = self._dp.build_accum_steps()
        self._apply_accum_fn = apply_step
        # Build the accumulator INSIDE jit so its arrays inherit the params'
        # (global, replicated) shardings — a host-created zeros tree could
        # not mix with multi-host global arrays.
        zeros_init = jax.jit(
            lambda p: (
                jax.tree_util.tree_map(
                    lambda x: jnp.zeros(jnp.shape(x), jnp.float32), p
                ),
                jnp.zeros((), jnp.float32),
            )
        )

        def accumulating(params, opt_state, stacked_mb, rng, lr_factor, weights):
            state = self._grad_accum_state
            if state is None:
                acc, w_acc = zeros_init(params)
                count = 0
            else:
                acc, w_acc, count = state
            acc, w_acc, loss, metrics = grad_step(
                params, acc, w_acc, stacked_mb, rng, weights
            )
            count += 1
            if count >= k:
                params, opt_state = apply_step(params, opt_state, acc, w_acc, lr_factor)
                self._grad_accum_state = None
            else:
                self._grad_accum_state = (acc, w_acc, count)
                self._last_lr_factor = lr_factor
            return params, opt_state, loss, metrics

        self._train_step_fn = accumulating

    def _flush_accumulated_grads(self, opt_state):
        """DP accumulation state carries (acc, weight_total, count)."""
        if getattr(self, "_grad_accum_state", None) is None:
            return opt_state
        acc, w_acc, _ = self._grad_accum_state
        self._grad_accum_state = None
        self.params, opt_state = self._apply_accum_fn(
            self.params, opt_state, acc, w_acc,
            getattr(self, "_last_lr_factor", 1.0),
        )
        return opt_state

    def _empty_minibatch(self) -> Dict[str, Any]:
        """A fully masked batch used to pad the last device group."""
        if self._empty_minibatch_template is None:
            self._empty_minibatch_template = self.model.finalize_minibatch(
                self.model.initialize_minibatch()
            )
        return self._empty_minibatch_template

    # Grouping hooks, overridable by sibling trainers (the node-sharded
    # trainer reshards each minibatch and may skip over-budget ones).
    def _prepare_minibatch(self, mb_data) -> Optional[Dict[str, Any]]:
        """Per-minibatch transform before grouping; None skips the batch."""
        return mb_data

    def _group_slots_per_host(self) -> int:
        """How many prepared minibatches form one local step group."""
        return self.num_local_devices

    def _stack_group(self, group: List[Dict[str, Any]]) -> Dict[str, Any]:
        return stack_minibatches(group)

    def _empty_prepared_minibatch(self) -> Dict[str, Any]:
        prepared = self._prepare_minibatch(self._empty_minibatch())
        assert prepared is not None, "the empty padding batch must be preparable"
        return prepared

    def _empty_stacked_group(self) -> Dict[str, Any]:
        return self._stack_group(
            [self._empty_prepared_minibatch()] * self._group_slots_per_host()
        )

    def _group_minibatches(self, minibatch_iterator):
        """Yield (stacked group of per-host minibatches, raw sample lists,
        per-slot real-sample weights). Padding batches get weight 0 so the
        weighted psum in parallel/dp.py ignores them.

        Multi-host: every process must execute the same number of steps
        (SPMD collectives). After each local group, hosts agree via a tiny
        allgather whether anyone still has data; exhausted hosts keep
        feeding fully masked empty groups — the reference's
        DDP.join(throw_on_early_termination) semantics
        (distributedtrainer.py:55) without dynamic teardown."""
        per_host = self._group_slots_per_host()

        def local_groups():
            group: List[Dict[str, Any]] = []
            raw: List[Any] = []
            counts: List[float] = []
            for mb_data, raw_samples in minibatch_iterator:
                prepared = self._prepare_minibatch(mb_data)
                if prepared is None:
                    continue
                group.append(prepared)
                raw.extend(raw_samples)
                counts.append(float(len(raw_samples)))
                if len(group) == per_host:
                    yield self._stack_group(group), raw, np.asarray(counts, np.float32)
                    group, raw, counts = [], [], []
            if group:
                while len(group) < per_host:
                    group.append(self._empty_prepared_minibatch())
                    counts.append(0.0)
                yield self._stack_group(group), raw, np.asarray(counts, np.float32)

        if jax.process_count() == 1:
            yield from local_groups()
            return

        from jax.experimental import multihost_utils

        it = iter(local_groups())
        empty_group = None
        while True:
            item = next(it, None)
            anyone = multihost_utils.process_allgather(
                np.asarray(item is not None, np.int32)
            )
            if not int(np.max(anyone)):
                return
            if item is None:
                if empty_group is None:
                    empty_group = self._empty_stacked_group()
                yield empty_group, [], np.zeros(per_host, np.float32)
            else:
                yield item

    # ------------------------------------------------------------------
    def _globalize(self, params, opt_state):
        """Multi-host: lift host-side params/optimizer state into globally
        sharded arrays once (replicated; ZeRO-1 resharding happens inside
        the step's with_sharding_constraint)."""
        if jax.process_count() == 1 or self._globalized:
            return params, opt_state
        params = self._dp.device_put_params(params)
        if opt_state is not None:
            opt_state = self._dp._put(
                jax.tree_util.tree_map(np.asarray, opt_state), self._dp.replicated()
            )
        self._globalized = True
        self._params = params
        return params, opt_state

    def _run_training(
        self, training_tensors, epoch, optimizer, opt_state, scheduler, parallelize,
        shuffle_input=True, show_progress_bar=False,
    ):
        sum_epoch_loss, num_minibatches, num_samples = 0.0, 0, 0
        metrics_acc = MetricsAccumulator()
        start_time = time.time()
        rng = jax.random.PRNGKey(self._seed * 1_000_003 + epoch)
        params, opt_state = self._globalize(self.params, opt_state)
        # The SPMD step DONATES params/opt_state; keep the trainer's own
        # state as a host snapshot so a mid-epoch crash (OOM, interrupt)
        # leaves self.params restorable instead of aliasing deleted buffers.
        self.params = jax.tree_util.tree_map(np.asarray, params)
        for step_idx, (stacked_mb, raw_samples, weights) in enumerate(
            self._group_minibatches(
                self.model.minibatch_iterator(
                    training_tensors(),
                    max_minibatch_size=self._minibatch_size,
                    yield_partial_minibatches=False,
                    shuffle_input=shuffle_input,
                    parallelize=parallelize,
                    # deterministic per (seed, epoch); decorrelated per host
                    shuffle_rng=random.Random(
                        (self._seed * 1_000_003 + epoch) * 7919
                        + jax.process_index()
                    ),
                )
            )
        ):
            # optimizer-step units: k accumulated groups share one index
            lr_factor = (
                1.0
                if scheduler is None
                else scheduler.step(epoch, step_idx // self._grad_accum_steps)
            )
            stacked_mb = self._dp.device_put_batch(stacked_mb)
            params, opt_state, loss, metrics = self._train_step_fn(
                params, opt_state, stacked_mb, jax.random.fold_in(rng, step_idx),
                lr_factor, self._dp.device_put_weights(weights),
            )
            sum_epoch_loss += float(loss)
            num_minibatches += 1
            num_samples += len(raw_samples)
            metrics_acc.update(metrics)
        self.params = params
        if self._grad_accum_steps > 1:
            opt_state = self._flush_accumulated_grads(opt_state)
        if not np.isfinite(sum_epoch_loss):
            raise Exception("Loss has a NaN value.")

        elapsed = time.time() - start_time
        assert num_minibatches > 0, "No training minibatches were created."
        self.LOGGER.info(
            "Training complete in %.1fsec [%.2f samples/sec] on %s devices.",
            elapsed, num_samples / elapsed, self.num_devices,
        )
        self.LOGGER.info("Epoch %i: Train Loss %.2f", epoch + 1, sum_epoch_loss / num_minibatches)
        train_metrics = self.neural_module.finalize_metrics(metrics_acc.totals())
        # Throughput reporting, matching the single-device trainer
        # (core/trainer.py) so the multi-chip path shows its own edges/s.
        train_metrics["_throughput"] = {
            "samples_per_sec": num_samples / elapsed,
            **{
                f"{k}_per_sec": metrics_acc.totals()[k] / elapsed
                for k in ("num_graphs", "num_nodes", "num_edges")
                if k in metrics_acc.totals()
            },
        }
        for hook in self._train_epoch_end_hooks:
            hook(self.model, self.neural_module, epoch, train_metrics)
        return opt_state

    def _run_validation(self, validation_tensors, epoch, best_target_metric, parallelize):
        sum_epoch_loss, sum_weight, num_samples = 0.0, 0.0, 0
        metrics_acc = MetricsAccumulator()
        params, _ = self._globalize(self.params, None)
        for stacked_mb, raw_samples, weights in self._group_minibatches(
            self.model.minibatch_iterator(
                validation_tensors(),
                max_minibatch_size=self._minibatch_size,
                yield_partial_minibatches=True,
                shuffle_input=False,
                parallelize=parallelize,
            )
        ):
            stacked_mb = self._dp.device_put_batch(stacked_mb)
            loss, metrics, group_w = self._eval_step_fn(
                params, stacked_mb, self._dp.device_put_weights(weights)
            )
            # Weight each group by its GLOBAL real-sample count: all-padding
            # groups (exhausted hosts keeping the SPMD step counts aligned)
            # carry weight 0 and must not deflate the epoch loss.
            group_w = float(group_w)
            sum_epoch_loss += float(loss) * group_w
            sum_weight += group_w
            num_samples += len(raw_samples)
            metrics_acc.update(metrics)
        # A host whose validation shard is empty still executes the SPMD eval
        # steps (empty masked groups, see _group_minibatches), so the
        # no-data check must be on the GLOBAL sample count — a local assert
        # would crash this host while the others wait in the collectives.
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            num_samples = int(
                np.sum(
                    multihost_utils.process_allgather(
                        np.asarray(num_samples, np.int64)
                    )
                )
            )
        assert num_samples > 0, "No validation data was found."
        validation_loss = sum_epoch_loss / max(sum_weight, 1e-9)
        self.LOGGER.info("Epoch %i: Valid Loss %.2f", epoch + 1, validation_loss)

        validation_metrics = self.neural_module.finalize_metrics(metrics_acc.totals())
        for hook in self._validation_epoch_end_hooks:
            hook(self.model, self.neural_module, epoch, validation_metrics)

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
    # Multi-host persistence: collectives run on every host; only the
    # coordinator writes (reference: rank-0-only checkpointing,
    # distributedtrainer.py:358-363,375-381).
    def _save_checkpoint(self) -> None:
        if self.is_coordinator:
            super()._save_checkpoint()

    def _restore_checkpoint(self) -> None:
        if jax.process_count() == 1:
            super()._restore_checkpoint()
            self._globalized = False
            return
        from jax.experimental import multihost_utils

        # don't read while the coordinator may still be writing
        multihost_utils.sync_global_devices("ptgnn_tpu_restore_checkpoint")
        # Checkpoints are written coordinator-only; on hosts without a shared
        # filesystem the path may be stale or absent locally, so ONLY the
        # coordinator reads and its params are broadcast — otherwise each
        # host would silently contribute different 'replicated' shards.
        if self.is_coordinator:
            super()._restore_checkpoint()
            payload = jax.tree_util.tree_map(np.asarray, self._params)
        else:
            payload = None
        self._params = self._broadcast_from_coordinator(payload)
        self._globalized = False  # params are host-side again

    def _save_optimizer_state(self, opt_state, next_epoch: int) -> None:
        if jax.process_count() > 1:
            # ZeRO-1 shards live across hosts; re-replicate so every host
            # holds the full state, then the coordinator writes it.
            opt_state = jax.jit(
                lambda s: s,
                out_shardings=jax.tree_util.tree_map(
                    lambda _: self._dp.replicated(), opt_state
                ),
            )(opt_state)
        if self.is_coordinator:
            super()._save_optimizer_state(opt_state, next_epoch)


def initialize_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host run (replaces the reference's process-group init,
    distributedtrainer.py:283-285). Call before creating the trainer; each
    host then sees its local devices plus the global mesh."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
