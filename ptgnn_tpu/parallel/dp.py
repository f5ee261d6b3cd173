"""Data parallelism over a JAX device mesh.

TPU-native replacement for the reference's DDP trainer
(ptgnn/baseneuralmodel/distributedtrainer.py:28-397): instead of NCCL
process groups and gradient hooks, the whole optimization step is ONE
compiled SPMD program over a ``Mesh`` with a ``data`` axis — per-device
loss/grad on the local statically shaped batch, a ``psum`` of gradients and
metric accumulators over ICI, and a replicated optimizer update. There is no
dynamic ``join()`` (distributedtrainer.py:55): every device always receives a
(possibly empty, fully masked) batch, so step counts agree by construction —
padding does what DDP's uneven-input machinery does.

Host-side, minibatches are stacked along a leading device axis
(``stack_minibatches``) and fed with a sharding that splits that axis across
the mesh.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

def _shard_map(f, *, mesh, in_specs, out_specs):
    try:  # jax >= 0.8: top-level export, check_vma kwarg
        from jax import shard_map

        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except (ImportError, TypeError):  # pragma: no cover
        # TypeError: the top-level export exists but predates the
        # check_rep -> check_vma rename; fall back with the old kwarg.
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )


def stack_minibatches(minibatches: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack N finalized (host numpy) minibatches along a new leading device
    axis. All minibatches must share shapes (they do: shapes are static)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *minibatches)


def _cast_floats(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


class ShardedPlacementMixin:
    """Device placement + ZeRO-1 optimizer-state plumbing shared by
    :class:`DataParallel` and ``NodeParallel`` (parallel/node_sharding.py).

    Subclasses provide ``self.mesh``, ``self.optimizer``, and the
    ``_opt_shard_axis`` property — the mesh axis the optimizer moments shard
    along (ZeRO-1), or None to keep them replicated."""

    @property
    def _opt_shard_axis(self):
        raise NotImplementedError

    def replicated(self):
        return NamedSharding(self.mesh, P())

    def _put(self, tree, sharding_tree):
        """Place ``tree`` under a single sharding or a matching tree of
        shardings. Multi-host: each process contributes its local block of
        the globally sharded array (replicated leaves pass the full value)."""
        if jax.process_count() == 1:
            return jax.device_put(tree, sharding_tree)
        if not isinstance(sharding_tree, (list, tuple, dict)) and not hasattr(
            sharding_tree, "_fields"
        ):
            sharding_tree = jax.tree_util.tree_map(lambda _: sharding_tree, tree)
        return jax.tree_util.tree_map(
            lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
            tree, sharding_tree,
        )

    def device_put_params(self, params):
        return self._put(params, self.replicated())

    def init_opt_state(self, params):
        """Moments in their target shardings from the start: optimizer.init
        on raw params would build the full replicated state first — OOM in
        exactly the regime ZeRO-1 exists for."""
        shard = self._opt_shard_axis is not None
        if jax.process_count() > 1:
            # Multi-host: materialize the state inside jit with the target
            # output shardings (hosts can't device_put partially owned
            # global arrays).
            shape = jax.eval_shape(self.optimizer.init, params)
            shardings = (
                self._zero1_opt_sharding(shape) if shard else
                jax.tree_util.tree_map(lambda _: self.replicated(), shape)
            )
            return jax.jit(self.optimizer.init, out_shardings=shardings)(params)
        opt_state = self.optimizer.init(params)
        if not shard:
            return jax.device_put(opt_state, self.replicated())
        return jax.device_put(opt_state, self._zero1_opt_sharding(opt_state))

    def _zero1_opt_sharding(self, opt_state):
        """Shard every moment tensor whose leading dim divides the axis;
        scalars (step counts) stay replicated."""
        axis = self._opt_shard_axis
        size = self.mesh.shape[axis]

        def leaf_sharding(leaf):
            if (
                hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] > 0 and leaf.shape[0] % size == 0
            ):
                return NamedSharding(self.mesh, P(axis))
            return self.replicated()

        return jax.tree_util.tree_map(leaf_sharding, opt_state)


class DataParallel(ShardedPlacementMixin):
    """Builds jitted SPMD train/eval steps for a module over a mesh.

    The module protocol matches ModelTrainer's: ``module.apply(params,
    **minibatch, train=..., rng=...) -> (loss, metrics)``. Metrics are summed
    (psum) across devices; loss is averaged.

    ``zero1=True`` shards Adam's optimizer state over the data axis
    (ZeRO-1, the reference's ZeroRedundancyOptimizer capability,
    typilus/traindistributed.py:50-72): each device keeps 1/N of the
    moments, updates its shard, and all-gathers updated params.
    """

    def __init__(
        self,
        module,
        optimizer: optax.GradientTransformation,
        mesh: Mesh,
        *,
        axis: str = "data",
        enable_amp: bool = False,
        zero1: bool = False,
    ):
        self.module = module
        self.optimizer = optimizer
        self.mesh = mesh
        self.axis = axis
        self.enable_amp = enable_amp
        self.zero1 = zero1
        self.num_devices = mesh.shape[axis]

    # -- sharding helpers (placement/ZeRO-1 live in ShardedPlacementMixin) --
    @property
    def _opt_shard_axis(self):
        return self.axis if self.zero1 else None

    def batch_sharding(self):
        return NamedSharding(self.mesh, P(self.axis))

    @property
    def num_local_devices(self) -> int:
        """Devices of this mesh owned by THIS process (== num_devices in
        single-controller runs; the per-host group size under multi-host)."""
        return sum(1 for d in self.mesh.devices.flat if d.process_index == jax.process_index())

    def device_put_batch(self, stacked_mb):
        """stacked_mb's leading axis is num_local_devices under multi-host
        (each host stacks only its own group) or num_devices otherwise."""
        return self._put(stacked_mb, self.batch_sharding())

    def device_put_weights(self, weights):
        return self._put(np.asarray(weights, np.float32), self.batch_sharding())

    # -- step builders ----------------------------------------------------
    def _loss_fn(self, params, minibatch, rng, train: bool):
        if self.enable_amp:
            params = _cast_floats(params, jnp.bfloat16)
            minibatch = _cast_floats(minibatch, jnp.bfloat16)
        loss, metrics = self.module.apply(params, **minibatch, train=train, rng=rng)
        return loss.astype(jnp.float32), metrics

    def build_train_step(self) -> Callable:
        """Returns jit(train_step)(params, opt_state, stacked_mb, rng,
        lr_factor, weights=None) -> (params, opt_state, mean loss, summed
        metrics).

        stacked_mb has a leading [num_devices] axis sharded over the mesh.
        ``weights`` is an optional [num_devices] f32 array of per-device real
        sample counts: loss and gradients are averaged as
        psum(w * x) / psum(w), so fully masked padding batches (w=0) do not
        dilute the step (the reference's DDP.join analogue). None means
        uniform weights, i.e. a plain pmean.
        """
        grads_fn = self._build_grads_fn()

        def train_step(params, opt_state, stacked_mb, rng, lr_factor, weights=None):
            if weights is None:
                weights = jnp.ones((self.num_devices,), jnp.float32)
            grads, loss, metrics, _ = grads_fn(params, stacked_mb, rng, weights)
            params, opt_state = self._apply(params, opt_state, grads, lr_factor)
            return params, opt_state, loss, metrics

        donate = (0, 1)
        return jax.jit(train_step, donate_argnums=donate)

    def _build_grads_fn(self):
        """shard_map producing the weighted-mean gradients plus the weight
        total (psum of per-device real counts — the normalizer)."""
        axis = self.axis

        def per_device_grads(params, mb, rng, w):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            (loss, metrics), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(params, mb, rng, True)
            grads = _cast_floats(grads, jnp.float32)
            # Weighted gradient all-reduce (the DDP equivalent) over ICI.
            w = w.reshape(())
            wsum = jnp.maximum(jax.lax.psum(w, axis), 1e-9)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g * w, axis) / wsum, grads
            )
            loss = jax.lax.psum(loss * w, axis) / wsum
            metrics = jax.tree_util.tree_map(lambda m: jax.lax.psum(m, axis), metrics)
            return grads, loss, metrics, wsum

        return _shard_map(
            lambda params, smb, rng, w: per_device_grads(
                params, jax.tree_util.tree_map(lambda x: x[0], smb), rng, w
            ),
            mesh=self.mesh,
            in_specs=(P(), P(self.axis), P(), P(self.axis)),
            out_specs=(P(), P(), P(), P()),
        )

    def _apply(self, params, opt_state, grads, lr_factor):
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_factor, updates)
        params = optax.apply_updates(params, updates)
        if self.zero1:
            # ZeRO-1: moments stay sharded over the data axis; the param
            # update runs shardwise and this constraint is the all-gather
            # that re-replicates params for the next step.
            params = jax.lax.with_sharding_constraint(params, self.replicated())
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, self._zero1_opt_sharding(opt_state)
            )
        return params, opt_state

    def build_accum_steps(self):
        """Gradient accumulation for the SPMD path: ``grad_step`` adds one
        device group's weighted gradient SUM (and weight total) to a
        replicated accumulator; ``apply_step`` divides by the accumulated
        weight and runs the optimizer once. Weighted exactly like
        build_train_step: the final update equals one step on the
        real-count-weighted mean gradient of ALL accumulated microbatches
        (padding groups contribute weight 0).
        """
        grads_fn = self._build_grads_fn()

        def grad_step(params, grad_acc, w_acc, stacked_mb, rng, weights):
            grads, loss, metrics, wsum = grads_fn(params, stacked_mb, rng, weights)
            grad_acc = jax.tree_util.tree_map(
                lambda a, g: a + g * wsum, grad_acc, grads
            )
            return grad_acc, w_acc + wsum, loss, metrics

        def apply_step(params, opt_state, grad_acc, w_acc, lr_factor):
            grads = jax.tree_util.tree_map(
                lambda a: a / jnp.maximum(w_acc, 1e-9), grad_acc
            )
            return self._apply(params, opt_state, grads, lr_factor)

        return (
            jax.jit(grad_step, donate_argnums=(1,)),
            jax.jit(apply_step, donate_argnums=(0, 1, 2)),
        )

    def build_eval_step(self) -> Callable:
        axis = self.axis

        def per_device_eval(params, mb, w):
            loss, metrics = self._loss_fn(params, mb, None, False)
            w = w.reshape(())
            wsum_raw = jax.lax.psum(w, axis)
            wsum = jnp.maximum(wsum_raw, 1e-9)
            loss = jax.lax.psum(loss * w, axis) / wsum
            metrics = jax.tree_util.tree_map(lambda m: jax.lax.psum(m, axis), metrics)
            # The raw global weight total lets callers weight per-group losses
            # so all-padding groups (exhausted multi-host shards) don't
            # deflate the epoch mean.
            return loss, metrics, wsum_raw

        eval_fn = _shard_map(
            lambda params, smb, w: per_device_eval(
                params, jax.tree_util.tree_map(lambda x: x[0], smb), w
            ),
            mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P(), P()),
        )

        def eval_step(params, stacked_mb, weights=None):
            if weights is None:
                weights = jnp.ones((self.num_devices,), jnp.float32)
            return eval_fn(params, stacked_mb, weights)

        return jax.jit(eval_step)
