"""Worker process for the 2-process multi-host smoke test
(tests/test_multihost.py). Each process owns 4 virtual CPU devices; the two
join through jax.distributed.initialize and train one
DistributedModelTrainer SPMD program over the 8-device global mesh —
replacing the reference's NCCL rendezvous (distributedtrainer.py:283-285).

Run: python tests/multihost_worker.py <pid> <nproc> <coordinator> <outdir>
"""
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], Path(sys.argv[4])
    accum = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    epochs = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    sys.path.insert(0, str(REPO))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ptgnn_tpu.parallel.distributed_trainer import initialize_multi_host

    initialize_multi_host(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import numpy as np
    import optax

    from ptgnn_tpu.core.data import LazyDataIterable, ShardedLazyDataIterable
    from ptgnn_tpu.parallel.distributed_trainer import DistributedModelTrainer
    from tests.test_trainer_lifecycle import SimpleRegressionModel, synthetic_data

    train = synthetic_data(np.random.RandomState(42), 3000)
    valid = synthetic_data(np.random.RandomState(1), 400)

    def shard(rank=None, world_size=None):
        # Deliberately uneven: host 0 gets ~2x host 1's samples, so the
        # per-step allgather agreement (the DDP.join analogue) must pad
        # host 1 with empty groups.
        cut = len(train) * 2 // 3
        own = train[:cut] if rank == 0 else train[cut:]
        return iter(own)

    train_it = ShardedLazyDataIterable(shard)
    train_it.set_rank(pid, nproc)

    trainer = DistributedModelTrainer(
        SimpleRegressionModel(),
        outdir / "model.pkl.gz",
        max_num_epochs=epochs,
        minibatch_size=64,
        gradient_accumulation_steps=accum,
        optimizer_creator=lambda: optax.adam(1e-2),
    )
    trainer.train(
        train_it,
        LazyDataIterable(lambda: iter(valid)),
        parallelize=False,
        validate_on_start=False,
        patience=epochs,
    )

    params_np = jax.tree_util.tree_map(np.asarray, trainer.params)
    checksum = float(sum(np.abs(leaf).sum() for leaf in jax.tree_util.tree_leaves(params_np)))
    accuracy = trainer.model.compute_accuracy(valid, params_np, trainer.neural_module)
    (outdir / f"result_{pid}.json").write_text(
        json.dumps({"checksum": checksum, "accuracy": float(accuracy)})
    )


if __name__ == "__main__":
    main()
