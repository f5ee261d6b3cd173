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


def load_from_folder(
    path, shuffle: bool, pattern: str = "*.jsonl.gz",
    rank: Optional[int] = None, world_size: Optional[int] = None,
) -> Iterator[Any]:
    """Stream samples from every matching file in a folder.

    With rank/world_size, files are interleaved round-robin across ranks
    (reference: typilus/traindistributed.py:37-47).
    """
    all_files: List[Path] = sorted(Path(path).glob(pattern))
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
