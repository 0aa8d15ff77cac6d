"""Process-scoped scratch directories.

Every operator that materializes intermediate parquet (sinks, bucket
caches, replay slices, checkpoint dirs) used to call
``tempfile.mkdtemp`` directly and never delete the result — one dir
set leaked per process, unbounded /tmp growth on a long-lived host
(the round-7 advice class first found in stats_barrier). This module
is the one audited allocation point: dirs are tracked and removed at
interpreter exit. Mid-process they MUST survive, because the lazy
DataFrames returned by sink/round-trip operators re-read the files on
every action.

Driver-local paths ⇒ local/single-node semantics, as documented on
every caller; a cluster deployment would point these at shared
storage with storage-side lifecycle rules.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH: list[str] = []


def scratch_dir(prefix: str = "dms_") -> str:
    """mkdtemp that is rmtree'd at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH.append(d)
    return d


def register_scratch(path: str) -> str:
    """Register an externally-constructed engine-owned path (per-PID
    warehouse / bucket-db locations) for the same exit-time cleanup.
    Only call on paths this process created and owns."""
    if path not in _SCRATCH:
        _SCRATCH.append(path)
    return path


@atexit.register
def _cleanup_scratch() -> None:
    for d in _SCRATCH:
        shutil.rmtree(d, ignore_errors=True)
