"""Host-wide serialization for CPU-heavy JAX work (multi-device dryruns,
multi-process rehearsals, e2e CLI trainings).

This image is a 1-core VM: two concurrent 8-device CPU JAX runs starve each
other's XLA thread pools hard enough to die with a fatal Python error (seen
round 3: the full test suite crashed mid-run while a separate
dryrun_multichip process was active). Every heavy entry point takes this
lock so a driver, a judge, and a test run can overlap safely — they simply
queue.

The lock is REENTRANT ACROSS PROCESS TREES via an inherited env marker:
a subprocess spawned by a lock holder (e.g. the dryrun fallback re-exec)
sees the marker and skips acquisition, so parent/child never deadlock on
flock's per-open-file-description semantics.
"""

from __future__ import annotations

import contextlib
import fcntl
import os

LOCK_PATH = "/tmp/aae_tpu_host_heavy.lock"
_HELD_ENV = "AAE_HOST_HEAVY_LOCK_HELD"


@contextlib.contextmanager
def host_heavy_lock():
    """Blocking exclusive lock; no-op when an ancestor already holds it."""
    if os.environ.get(_HELD_ENV):
        yield
        return
    fh = open(LOCK_PATH, "w")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX)
        os.environ[_HELD_ENV] = "1"
        try:
            yield
        finally:
            os.environ.pop(_HELD_ENV, None)
    finally:
        fh.close()  # closing the fd releases the flock
