"""Remote dataset IO through fsspec (the RichPath/--azure-info equivalent;
reference: ptgnn/implementations/typilus/train.py:9,141-145), exercised with
the in-process memory:// filesystem."""
import json

import numpy as np
import pytest

fsspec = pytest.importorskip("fsspec")

from ptgnn_tpu.utils.io import (
    configure_remote_io,
    data_path,
    is_remote_path,
    iter_jsonl,
    join_path,
    load_from_folder,
    open_binary,
    write_jsonl_gz,
)
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs


@pytest.fixture(autouse=True)
def clean_memory_fs():
    fs = fsspec.filesystem("memory")
    fs.store.clear()
    configure_remote_io()
    yield
    fs.store.clear()
    configure_remote_io()


def test_data_path_keeps_urls_and_converts_local():
    from pathlib import Path

    assert data_path("memory://bucket/train") == "memory://bucket/train"
    assert data_path("az://container/x") == "az://container/x"
    assert data_path("/tmp/data") == Path("/tmp/data")
    assert not is_remote_path("file:///tmp/x")


def test_jsonl_gz_roundtrip_over_memory_fs():
    samples = [{"a": 1}, {"b": [1, 2, 3]}, {"c": "x"}]
    write_jsonl_gz("memory://bucket/train/data.jsonl.gz", samples)
    assert list(load_from_folder("memory://bucket/train", shuffle=False)) == samples


def test_load_from_folder_remote_sorted_and_sharded():
    for i in range(4):
        write_jsonl_gz(f"memory://ds/train/part{i}.jsonl.gz", [{"i": i}])
    assert [s["i"] for s in load_from_folder("memory://ds/train", shuffle=False)] == [0, 1, 2, 3]
    assert [
        s["i"]
        for s in load_from_folder("memory://ds/train", shuffle=False, rank=1, world_size=2)
    ] == [1, 3]
    with pytest.raises(FileNotFoundError):
        list(load_from_folder("memory://ds/missing", shuffle=False))


def test_iter_jsonl_plain_remote():
    fs = fsspec.filesystem("memory")
    with fs.open("/plain/data.jsonl", "wb") as f:
        f.write(b'{"x": 1}\n\n{"x": 2}\n')
    assert list(iter_jsonl("memory://plain/data.jsonl")) == [{"x": 1}, {"x": 2}]


def test_configure_remote_io_rejects_non_object(tmp_path):
    bad = tmp_path / "auth.json"
    bad.write_text("[1, 2]")
    with pytest.raises(ValueError):
        configure_remote_io(bad)
    good = tmp_path / "ok.json"
    good.write_text('{"account_name": "x"}')
    configure_remote_io(good)  # stored; memory:// ignores unknown options


def test_ppi_loader_reads_remote_folder():
    from ptgnn_tpu.implementations.ppi.dataloader import PPIDatasetLoader

    rng = np.random.default_rng(0)
    nodes, feats, labels = 10, 4, 3
    with open_binary(join_path("memory://ppi", "train_graph.json"), "wb") as f:
        links = [{"source": i, "target": (i + 1) % nodes} for i in range(nodes)]
        f.write(json.dumps({"links": links}).encode())
    for name, arr in (
        ("train_feats.npy", rng.normal(size=(nodes, feats)).astype(np.float32)),
        ("train_labels.npy", rng.integers(0, 2, size=(nodes, labels)).astype(np.int64)),
        ("train_graph_id.npy", np.zeros(nodes, np.int64)),
    ):
        with open_binary(join_path("memory://ppi", name), "wb") as f:
            np.save(f, arr)
    samples = PPIDatasetLoader.load_data("memory://ppi", "train")
    assert len(samples) == 1
    assert samples[0].node_features.shape == (nodes, feats)
    assert samples[0].adjacency_lists[0].shape[1] == 2


def test_typilus_train_cli_in_process_on_memory_fs(tmp_path):
    """The full typilus train CLI against memory:// folders (in-process —
    the memory filesystem is per-process)."""
    from ptgnn_tpu.implementations.typilus import train as typilus_train

    for fold, n, seed in (("train", 12, 1), ("valid", 4, 2), ("test", 4, 3)):
        write_jsonl_gz(
            f"memory://typilus/{fold}/data.jsonl.gz",
            synthetic_typilus_graphs(n, seed=seed, mean_nodes=25, max_nodes=60),
        )
    model_path = tmp_path / "model.pkl.gz"
    args = typilus_train.build_arg_parser().parse_args([
        "memory://typilus/train", "memory://typilus/valid", "memory://typilus/test",
        str(model_path),
        "--max-num-epochs", "1", "--minibatch-size", "4",
        "--max-nodes", "256", "--sequential-run", "--quiet",
    ])
    assert args.train_data_path == "memory://typilus/train"
    typilus_train.run(args)
    assert model_path.exists()
