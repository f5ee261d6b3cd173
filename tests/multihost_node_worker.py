"""Worker process for the 2-process multi-host NODE-SHARDED smoke test
(tests/test_multihost.py). Two processes with 4 virtual CPU devices each
form a global (data=2, node=4) mesh — each host owns one data row of 4
node shards — and train Graph2Class with NodeShardedModelTrainer. This
exercises the multi-host legs the single-process tests cannot: budget
probing max-reduced across hosts, coordinator-only metadata broadcast,
per-host group accounting, and the empty-group padding under uneven
shards.

Run: python tests/multihost_node_worker.py <pid> <nproc> <coordinator> <outdir>
"""
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], Path(sys.argv[4])
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
    assert len(jax.devices()) == 4 * nproc

    import numpy as np
    import optax
    from jax.sharding import Mesh

    from ptgnn_tpu.core.data import LazyDataIterable, ShardedLazyDataIterable
    from ptgnn_tpu.implementations.typilus.harness import small_padding
    from ptgnn_tpu.implementations.typilus.train import create_graph2class_gnn_model
    from ptgnn_tpu.parallel.node_sharded_trainer import NodeShardedModelTrainer
    from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

    # A node axis spanning both processes must be REJECTED: hosts rank-shard
    # their data, so cross-process node groups would assemble shards of
    # different batches (parallel/node_sharding.py guard).
    from ptgnn_tpu.parallel.node_sharding import NodeParallel

    bad_mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("data", "node"))
    try:
        NodeParallel(object(), None, bad_mesh, axis="node", data_axis=None)
        raise SystemExit("cross-process node group was not rejected")
    except NotImplementedError:
        pass

    # (data=2, node=4): host p owns devices [4p, 4p+4) == data row p.
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "node"))

    train = list(synthetic_typilus_graphs(20, seed=1, mean_nodes=50, max_nodes=110))
    valid = list(synthetic_typilus_graphs(6, seed=2, mean_nodes=50, max_nodes=110))

    def shard(rank=None, world_size=None):
        # uneven on purpose: host 0 gets ~2/3 of the data
        cut = len(train) * 2 // 3
        return iter(train[:cut] if rank == 0 else train[cut:])

    train_it = ShardedLazyDataIterable(shard)
    train_it.set_rank(pid, nproc)

    model = create_graph2class_gnn_model(
        hidden_state_size=32, padding=small_padding(max_nodes=256, max_graphs=8),
    )
    trainer = NodeShardedModelTrainer(
        model,
        outdir / "model.pkl.gz",
        node_shards=4,
        mesh=mesh,
        max_num_epochs=2,
        minibatch_size=4,
        optimizer_creator=lambda: optax.adam(1e-3),
    )
    # metadata over the FULL dataset on the coordinator, broadcast to host 1
    trainer.load_metadata_and_create_network(
        LazyDataIterable(lambda: iter(train)), parallelize=False
    )
    trainer.train(
        train_it,
        LazyDataIterable(lambda: iter(valid)),
        initialize_metadata=False,
        parallelize=False,
        use_multiprocessing=False,
        validate_on_start=False,
        patience=4,
    )

    params_np = jax.tree_util.tree_map(np.asarray, trainer.params)
    checksum = float(
        sum(np.abs(leaf).sum() for leaf in jax.tree_util.tree_leaves(params_np))
    )
    (outdir / f"result_{pid}.json").write_text(
        json.dumps({"checksum": checksum, "budgets": trainer._budgets})
    )


if __name__ == "__main__":
    main()
