"""CLI integration: drive the typilus train CLI end to end through real
argv + jsonl.gz files on disk, and smoke --help for every entry point."""
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

from ptgnn_tpu.utils.io import write_jsonl_gz
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

def cpu_env():
    """Subprocess env forced to CPU: without this the child registers the
    axon TPU backend (JAX_PLATFORMS alone is ignored by that plugin) and
    pays tunnel compiles — or hangs if the chip is busy."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


CLIS = [
    "ptgnn_tpu.implementations.typilus.train",
    "ptgnn_tpu.implementations.typilus.traindistributed",
    "ptgnn_tpu.implementations.typilus.predict",
    "ptgnn_tpu.implementations.ppi.train",
    "ptgnn_tpu.implementations.varmisuse.train",
    "ptgnn_tpu.implementations.graph2seq.train",
    "ptgnn_tpu.implementations.graph2seq.test",
    "ptgnn_tpu.implementations.graph2seq.trainandtest",
]


@pytest.mark.parametrize("cli", CLIS)
def test_cli_help(cli):
    proc = subprocess.run(
        [sys.executable, "-m", cli, "--help"],
        capture_output=True, text=True, timeout=120,
        cwd=str(Path(__file__).parent.parent), env=cpu_env(),
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "usage" in proc.stdout.lower()


def test_typilus_train_cli_end_to_end():
    tmp = Path(tempfile.mkdtemp())
    for fold, n, seed in (("train", 16, 1), ("valid", 6, 2), ("test", 6, 3)):
        d = tmp / fold
        d.mkdir()
        write_jsonl_gz(
            d / "data.jsonl.gz",
            synthetic_typilus_graphs(n, seed=seed, mean_nodes=30, max_nodes=80),
        )
    model_path = tmp / "model.pkl.gz"
    proc = subprocess.run(
        [
            sys.executable, "-m", "ptgnn_tpu.implementations.typilus.train",
            str(tmp / "train"), str(tmp / "valid"), str(tmp / "test"),
            str(model_path),
            "--max-num-epochs", "1", "--minibatch-size", "8",
            "--max-nodes", "512", "--sequential-run", "--quiet",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(Path(__file__).parent.parent), env=cpu_env(),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert model_path.exists()
    assert "Test accuracy:" in proc.stdout


def test_graph2seq_trainandtest_cli_end_to_end():
    """Drive the graph2seq train+test CLI through real argv + jsonl.gz files,
    exercising the eval path (greedy decode + exact-match/F1/Jaro-Winkler)."""
    from ptgnn_tpu.utils.synthetic import synthetic_graph2seq_samples

    tmp = Path(tempfile.mkdtemp())
    for fold, n, seed in (("train", 24, 1), ("valid", 8, 2), ("test", 8, 3)):
        write_jsonl_gz(
            tmp / f"{fold}.jsonl.gz",
            synthetic_graph2seq_samples(n, seed=seed, mean_nodes=30, max_nodes=60),
        )
    model_path = tmp / "model.pkl.gz"
    proc = subprocess.run(
        [
            sys.executable, "-m", "ptgnn_tpu.implementations.graph2seq.trainandtest",
            str(tmp / "train.jsonl.gz"), str(tmp / "valid.jsonl.gz"),
            str(model_path), str(tmp / "test.jsonl.gz"),
            "--max-num-epochs", "1", "--minibatch-size", "8",
            "--max-nodes", "512", "--sequential-run", "--quiet",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(Path(__file__).parent.parent), env=cpu_env(),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert model_path.exists()
    assert "Test metrics:" in proc.stdout and "jaro_winkler" in proc.stdout


def write_typilus_folds(tmp: Path, sizes=(("train", 16, 1), ("valid", 6, 2), ("test", 6, 3))):
    for fold, n, seed in sizes:
        d = tmp / fold
        d.mkdir()
        write_jsonl_gz(
            d / "data.jsonl.gz",
            synthetic_typilus_graphs(n, seed=seed, mean_nodes=30, max_nodes=80),
        )


def run_cli(argv, timeout=600, extra_env=None):
    env = cpu_env()
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-m", *argv], capture_output=True, text=True,
        timeout=timeout, cwd=str(Path(__file__).parent.parent), env=env,
    )


def write_ppi_graphsage(tmp: Path):
    """Write train/valid/test folds in the GraphSAGE file layout the
    reference's PPI loader consumes (ppi/dataloader.py)."""
    import json

    import numpy as np

    from ptgnn_tpu.utils.synthetic import synthetic_ppi_graphs

    for fold, n, seed in (("train", 8, 0), ("valid", 3, 1), ("test", 3, 2)):
        graphs = synthetic_ppi_graphs(
            n, seed=seed, mean_nodes=25, num_labels=6, edges_per_node=4
        )
        feats, labels, gids, links = [], [], [], []
        offset = 0
        for gi, g in enumerate(graphs):
            nn = len(g["features"])
            feats.append(np.asarray(g["features"], np.float32))
            labels.append(np.asarray(g["labels"], np.int64))
            gids.append(np.full(nn, gi, np.int64))
            links.extend(
                {"source": int(s) + offset, "target": int(t) + offset}
                for s, t in np.asarray(g["edges"])
            )
            offset += nn
        np.save(tmp / f"{fold}_feats.npy", np.concatenate(feats))
        np.save(tmp / f"{fold}_labels.npy", np.concatenate(labels))
        np.save(tmp / f"{fold}_graph_id.npy", np.concatenate(gids))
        with open(tmp / f"{fold}_graph.json", "w") as f:
            json.dump({"links": links}, f)


def test_ppi_train_cli_end_to_end():
    tmp = Path(tempfile.mkdtemp())
    write_ppi_graphsage(tmp)
    model_path = tmp / "ppi.pkl.gz"
    proc = run_cli([
        "ptgnn_tpu.implementations.ppi.train", str(tmp), str(model_path),
        "--max-num-epochs", "1", "--minibatch-size", "2",
        "--max-nodes", "256", "--sequential-run", "--quiet",
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert model_path.exists()
    assert "f1" in proc.stdout.lower()


def test_varmisuse_train_cli_end_to_end():
    from ptgnn_tpu.utils.synthetic import synthetic_varmisuse_samples

    tmp = Path(tempfile.mkdtemp())
    for fold, n, seed in (("train", 12, 1), ("valid", 4, 2), ("test", 4, 3)):
        d = tmp / fold
        d.mkdir()
        write_jsonl_gz(
            d / "data.jsonl.gz",
            synthetic_varmisuse_samples(n, seed=seed, mean_tokens=40),
        )
    model_path = tmp / "vm.pkl.gz"
    proc = run_cli([
        "ptgnn_tpu.implementations.varmisuse.train",
        str(tmp / "train"), str(tmp / "valid"), str(tmp / "test"),
        str(model_path),
        "--max-num-epochs", "1", "--minibatch-size", "4",
        "--max-nodes", "512", "--sequential-run", "--quiet",
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert model_path.exists()
    assert "Test accuracy:" in proc.stdout


def test_graph2seq_train_then_test_cli_greedy_and_beam():
    """Standalone train CLI, then the test CLI twice: greedy and beam."""
    from ptgnn_tpu.utils.synthetic import synthetic_graph2seq_samples

    tmp = Path(tempfile.mkdtemp())
    for fold, n, seed in (("train", 16, 1), ("valid", 6, 2), ("test", 6, 3)):
        write_jsonl_gz(
            tmp / f"{fold}.jsonl.gz",
            synthetic_graph2seq_samples(n, seed=seed, mean_nodes=25, max_nodes=50),
        )
    model_path = tmp / "g2s.pkl.gz"
    proc = run_cli([
        "ptgnn_tpu.implementations.graph2seq.train",
        str(tmp / "train.jsonl.gz"), str(tmp / "valid.jsonl.gz"), str(model_path),
        "--max-num-epochs", "1", "--minibatch-size", "8",
        "--max-nodes", "512", "--sequential-run", "--quiet",
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert model_path.exists()

    greedy = run_cli([
        "ptgnn_tpu.implementations.graph2seq.test",
        str(model_path), str(tmp / "test.jsonl.gz"),
    ])
    assert greedy.returncode == 0, greedy.stderr[-2000:]
    assert "JW Sim" in greedy.stdout

    beam = run_cli([
        "ptgnn_tpu.implementations.graph2seq.test",
        str(model_path), str(tmp / "test.jsonl.gz"), "--beam-size", "2",
    ])
    assert beam.returncode == 0, beam.stderr[-2000:]
    assert "JW Sim" in beam.stdout


def test_typilus_traindistributed_cli_on_cpu_mesh():
    tmp = Path(tempfile.mkdtemp())
    write_typilus_folds(tmp)
    model_path = tmp / "dist.pkl.gz"
    proc = run_cli(
        [
            "ptgnn_tpu.implementations.typilus.traindistributed",
            str(tmp / "train"), str(tmp / "valid"), str(tmp / "test"),
            str(model_path),
            "--max-num-epochs", "1", "--minibatch-size", "4",
            "--max-nodes", "256", "--world-size", "4", "--quiet",
        ],
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert model_path.exists()


def test_typilus_traindistributed_cli_node_sharded():
    """--node-shards 4 on the 8-device CPU mesh: the hybrid (2 data x 4
    node) mesh trains multi-epoch with auto-probed budgets, validation and
    best-checkpoint restore (VERDICT round-3 item 2's done criterion)."""
    tmp = Path(tempfile.mkdtemp())
    write_typilus_folds(tmp)
    model_path = tmp / "nodesharded.pkl.gz"
    proc = run_cli(
        [
            "ptgnn_tpu.implementations.typilus.traindistributed",
            str(tmp / "train"), str(tmp / "valid"), str(tmp / "test"),
            str(model_path),
            "--max-num-epochs", "2", "--minibatch-size", "4",
            "--max-nodes", "256", "--node-shards", "4", "--quiet",
        ],
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert model_path.exists()
    assert "Node-sharding budgets probed" in (proc.stderr + proc.stdout)
    assert "Test accuracy:" in proc.stdout


def test_typilus_predict_cli_streams_predictions():
    tmp = Path(tempfile.mkdtemp())
    write_typilus_folds(tmp, sizes=(("train", 12, 1), ("valid", 4, 2), ("test", 4, 3)))
    model_path = tmp / "model.pkl.gz"
    train = run_cli([
        "ptgnn_tpu.implementations.typilus.train",
        str(tmp / "train"), str(tmp / "valid"), str(tmp / "test"),
        str(model_path),
        "--max-num-epochs", "1", "--minibatch-size", "8",
        "--max-nodes", "512", "--sequential-run", "--quiet",
    ])
    assert train.returncode == 0, train.stderr[-2000:]

    proc = run_cli([
        "ptgnn_tpu.implementations.typilus.predict",
        str(model_path), str(tmp / "test"),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Predicted:" in proc.stdout
