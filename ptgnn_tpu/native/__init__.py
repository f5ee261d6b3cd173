"""Native (C++) host runtime components, loaded via ctypes.

The Python implementations remain as fallbacks and correctness oracles; the
native paths accelerate the host-side batch-assembly pipeline that feeds the
device (the reference's analogue is its multiprocessing tensorization
pipeline, abstractneuralmodel.py:194-238 — ours additionally moves the hot
inner loop out of Python).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

LOGGER = logging.getLogger(__name__)
_LOAD_LOCK = threading.Lock()
_LIB_DIR = Path(__file__).parent
_LIB_PATH = _LIB_DIR / "libbatch_assembler.so"

_SRC_PATH = _LIB_DIR / "batch_assembler.cc"
_HASH_PATH = _LIB_DIR / "libbatch_assembler.so.srchash"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _source_hash() -> str:
    import hashlib

    return hashlib.sha256(_SRC_PATH.read_bytes()).hexdigest()


def _lib_is_fresh() -> bool:
    """Content-hash check: make's mtime freshness is defeated by git
    checkouts, so the build stamps the source hash next to the library."""
    try:
        return (
            _LIB_PATH.exists()
            and _HASH_PATH.exists()
            and _HASH_PATH.read_text().strip() == _source_hash()
        )
    except OSError:
        return False


def _try_build() -> bool:
    """Build under an exclusive file lock: concurrent processes (multi-host
    training, jobs sharing one checkout) must not each run `make -B` over the
    same .so — a reader could dlopen a partially written library. The lock
    holder builds; waiters re-check freshness once it is released."""
    try:
        import fcntl

        with open(_LIB_DIR / ".build.lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if _lib_is_fresh():  # someone else built while we waited
                    return True
                subprocess.run(
                    ["make", "-B", "-C", str(_LIB_DIR)], check=True,
                    capture_output=True, timeout=120,
                )
                if _LIB_PATH.exists():
                    _HASH_PATH.write_text(_source_hash())
                    return True
                return False
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)
    except Exception as exc:  # noqa: BLE001 - any failure -> fallback
        LOGGER.info("Native assembler build failed (%s); using Python fallback.", exc)
        return False


def get_assembler() -> Optional[ctypes.CDLL]:
    """The loaded native library, (re)built on first use whenever the source
    changed; None if unavailable (callers fall back to Python)."""
    if _lib is not None:
        return _lib
    # _load_attempted may only be read under the lock: another thread could
    # be mid-load with the flag already set.
    with _LOAD_LOCK:
        return _load_assembler_locked()


def _load_assembler_locked() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("PTGNN_TPU_DISABLE_NATIVE"):
        return None
    if not _lib_is_fresh() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.assemble_edge_layout_v3.restype = ctypes.c_int
        lib.assemble_edge_layout_v3.argtypes = [
            i32p, i32p, i32p, i32p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, i32p, u8p, i32p, i32p, i32p, i32p,
        ]
        _lib = lib
    except (OSError, AttributeError) as exc:
        # AttributeError: the library loaded but lacks the expected symbol
        # (stale/corrupt .so) — the contract is "None -> Python fallback",
        # never a crash out of GraphBatcher.finalize.
        LOGGER.info("Native assembler load failed (%s); using Python fallback.", exc)
    return _lib


def assemble_edge_layout(
    senders: np.ndarray,
    receivers: np.ndarray,
    types: np.ndarray,
    payload: Optional[np.ndarray] = None,
    *,
    max_nodes: int,
    e_pad: int,
    tile: int,
    agg_rows: int,
    num_types: int,
    align: int = 0,
    sender_domain: Optional[int] = None,
) -> Optional[Tuple[np.ndarray, ...]]:
    """Run the native layout assembly; None if the library is unavailable or
    the edge budget is exceeded (caller handles both identically).

    ``sender_domain`` bounds sender ids when they index a different space
    than the receivers (node-sharded boundary layouts index a recv buffer);
    the C++ copies senders through without using them for the layout."""
    lib = get_assembler()
    if lib is None:
        return None
    # Validate before crossing the C ABI: the C++ loop indexes by receiver,
    # type, and payload position — out-of-range values would corrupt the
    # heap silently instead of raising like the Python fallback.
    n = len(senders)
    assert len(receivers) == n and len(types) == n, (n, len(receivers), len(types))
    assert payload is None or len(payload) == n, (n, len(payload))
    if n:
        assert int(receivers.min()) >= 0 and int(receivers.max()) < max_nodes, (
            "receiver out of range for the native assembler"
        )
        s_dom = max_nodes if sender_domain is None else sender_domain
        assert int(senders.min()) >= 0 and int(senders.max()) < s_dom, (
            "sender out of range for the native assembler"
        )
        assert int(types.min()) >= 0 and int(types.max()) < num_types, (
            "edge type out of range for the native assembler"
        )
    num_blocks = -(-max_nodes // agg_rows)
    n_tiles = e_pad // tile
    out_senders = np.empty(e_pad, np.int32)
    out_receivers = np.empty(e_pad, np.int32)
    out_types = np.zeros(e_pad, np.int32)
    out_local_rows = np.empty(e_pad, np.int32)
    out_mask = np.empty(e_pad, np.uint8)
    out_tile_types = np.empty(n_tiles, np.int32)
    out_tile_row_blocks = np.empty(n_tiles, np.int32)
    out_counts = np.empty(num_blocks * agg_rows, np.int32)
    out_payload = np.empty(e_pad, np.int32)
    if payload is None:
        payload = np.full(len(senders), -1, np.int32)
    rc = lib.assemble_edge_layout_v3(
        np.ascontiguousarray(senders, np.int32),
        np.ascontiguousarray(receivers, np.int32),
        np.ascontiguousarray(types, np.int32),
        np.ascontiguousarray(payload, np.int32),
        len(senders), max_nodes, e_pad, tile, agg_rows, num_types, align,
        out_senders, out_receivers, out_types, out_local_rows, out_mask,
        out_tile_types, out_tile_row_blocks, out_counts, out_payload,
    )
    if rc != 0:
        return None
    return (
        out_senders, out_receivers, out_types, out_local_rows,
        out_mask.astype(bool), out_tile_types, out_tile_row_blocks,
        out_counts.reshape(num_blocks, agg_rows), out_payload,
    )
