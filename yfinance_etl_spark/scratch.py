"""Scratch-directory helper shared by sinks/staging paths.

One place for the tempdir + content-key layout and the reuse-vs-fresh
policy, instead of four hand-rolled variants with subtly different
caching behavior.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

#: marker file that stamps a staging directory as fully written
_COMPLETE = ".complete"


def scratch_dir(name: str, key: str, fresh: bool = False) -> str:
    """Deterministic scratch path for (component name, content key).

    ``fresh=True`` wipes any previous contents (write paths that must not
    observe stale output). ``fresh=False`` returns the path as-is; use
    ``is_staged``/``mark_staged`` for resumable staging.
    """
    d = os.path.join(
        tempfile.gettempdir(), name, hashlib.md5(key.encode()).hexdigest()[:12]
    )
    if fresh:
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def is_staged(d: str) -> bool:
    """True only if a previous staging run COMPLETED (partial directories
    from an interrupted run are re-staged, not silently reused)."""
    return os.path.exists(os.path.join(d, _COMPLETE))


def mark_staged(d: str) -> None:
    with open(os.path.join(d, _COMPLETE), "w") as f:
        f.write("ok")
