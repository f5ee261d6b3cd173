"""Device-OOM catch-and-continue (reference: ptgnn/baseneuralmodel/utils/
oom.py:11-23).

The reference catches CUDA allocator failures, empties the cache, and skips
the offending minibatch. On TPU/XLA, allocation failures surface as
RuntimeError/XlaRuntimeError mentioning RESOURCE_EXHAUSTED; with statically
shaped batches they can only occur on the first execution of a
configuration, but the recovery hook is kept for API parity and for
dynamically sized host-side failures.
"""
from __future__ import annotations

import logging
from contextlib import contextmanager

LOGGER = logging.getLogger(__name__)

_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory", "OOM")


def is_oom_error(error: BaseException) -> bool:
    message = str(error)
    return any(marker in message for marker in _OOM_MARKERS)


@contextmanager
def catch_device_oom(enabled: bool = True):
    """Swallow a device OOM and continue (skipping the current minibatch)."""
    if not enabled:
        yield
        return
    try:
        yield
    except RuntimeError as error:
        if not is_oom_error(error):
            raise
        LOGGER.exception("A device OOM error was caught; skipping minibatch.")


# Alias matching the reference's name for discoverability.
catch_cuda_oom = catch_device_oom
