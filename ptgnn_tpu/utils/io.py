"""Dataset file IO: jsonl.gz folders (replaces dpu-utils RichPath usage in the
reference CLIs, e.g. ptgnn/implementations/typilus/train.py:123-128)."""
from __future__ import annotations

import gzip
import json
import random
from pathlib import Path
from typing import Any, Iterator, List, Optional


def iter_jsonl_gz(path: Path) -> Iterator[Any]:
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def iter_jsonl(path: Path) -> Iterator[Any]:
    """Stream one jsonl file, gzipped or plain (by extension)."""
    if str(path).endswith(".gz"):
        yield from iter_jsonl_gz(path)
        return
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def load_from_folder(
    path, shuffle: bool, pattern: str = "*.jsonl.gz",
    rank: Optional[int] = None, world_size: Optional[int] = None,
) -> Iterator[Any]:
    """Stream samples from every matching file in a folder.

    With rank/world_size, files are interleaved round-robin across ranks
    (reference: typilus/traindistributed.py:37-47).
    """
    folder = Path(path)
    if not folder.is_dir():
        raise FileNotFoundError(f"dataset folder does not exist: {folder}")
    all_files: List[Path] = sorted(folder.glob(pattern))
    if not all_files:
        # Fail at the source: an empty stream otherwise surfaces much later
        # as 'no minibatches' or an empty vocabulary.
        raise FileNotFoundError(f"no '{pattern}' files under {folder}")
    if rank is not None and world_size is not None:
        all_files = [f for i, f in enumerate(all_files) if i % world_size == rank]
    if shuffle:
        random.shuffle(all_files)
    for file in all_files:
        yield from iter_jsonl_gz(file)


def write_jsonl_gz(path: Path, samples) -> None:
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for sample in samples:
            f.write(json.dumps(sample) + "\n")
