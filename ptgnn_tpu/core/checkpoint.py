"""Checkpoint I/O: gzip-pickled (model, numpy params) + optimizer state.

Mirrors the reference's checkpoint policy (abstractneuralmodel.py:154-164,
trainer.py:436-439): the whole picklable model object (metadata, vocabularies)
is saved together with the weights so a checkpoint is self-describing; the
optimizer state + epoch index go to a sibling ``.optimizerstate`` file.
No torch: parameters are plain numpy pytrees.

Trust model: pickle runs arbitrary code on load, exactly like the
reference's ``torch.load`` checkpoints — restore only files you produced or
trust. For an execute-nothing-on-restore format use the orbax path
(``core/orbax_checkpoint.py``), which stores the params/optimizer pytrees
without pickling (see README "Checkpoint formats and trust model").
"""
from __future__ import annotations

import gzip
import os
import pickle
from pathlib import Path
from typing import Any, Tuple

import jax
import numpy as np


def to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_optimizer_state(path: Path, opt_state: Any, epoch: int, extra: Any = None) -> None:
    # Write-then-rename: the trainer overwrites the SAME path every epoch,
    # and a crash mid-pickle would otherwise truncate the only resume state.
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with gzip.open(tmp, "wb") as f:
        pickle.dump({"optimizer_state": to_host(opt_state), "epoch": epoch, "extra": extra}, f)
    os.replace(tmp, path)


def load_optimizer_state(path: Path) -> Tuple[Any, int, Any]:
    with gzip.open(Path(path), "rb") as f:
        blob = pickle.load(f)
    return blob["optimizer_state"], blob["epoch"], blob.get("extra")
