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
