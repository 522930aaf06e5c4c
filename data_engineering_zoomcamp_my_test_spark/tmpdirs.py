"""Session-scoped ephemeral temp dirs (ADVICE r8).

The streaming exact-oracle decls (c66/c78/c80) leaked their drop/sink
dirs in /tmp on every invocation: the returned DataFrame lazily reads the
parquet sink, so the decl cannot rmtree it before the caller consumes it,
and under repeated parity sweeps and fuzz campaigns (hundreds of
invocations per round) the leak was unbounded.

All such dirs now live under ONE per-process parent,
``$TMPDIR/spark_graft_eph_<pid>/``, that

- an ``atexit`` hook removes when this interpreter exits (after any
  lazily-read DataFrame could still be consumed), and
- the next process opportunistically sweeps when the owning pid is gone
  (crashed/killed sessions can't leave permanent state behind).

Callers that can bound a dir's lifetime tighter (e.g. drop dirs consumed
entirely inside the decl) still rmtree it themselves; the parent is the
backstop that makes the leak class impossible, not a license to skip
cleanup.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_PARENT: str | None = None
_PREFIX = "spark_graft_eph_"


def _sweep_stale(base: str) -> None:
    """Remove sibling parents whose owning process no longer exists."""
    try:
        names = os.listdir(base)
    except OSError:
        return
    for name in names:
        if not name.startswith(_PREFIX):
            continue
        try:
            pid = int(name[len(_PREFIX):])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another user — leave its dirs alone


def ephemeral_dir(prefix: str) -> str:
    """A fresh temp dir that lives until this process exits, no longer."""
    global _PARENT
    if _PARENT is None:
        base = tempfile.gettempdir()
        _sweep_stale(base)
        parent = os.path.join(base, f"{_PREFIX}{os.getpid()}")
        os.makedirs(parent, exist_ok=True)
        atexit.register(shutil.rmtree, parent, ignore_errors=True)
        _PARENT = parent
    return tempfile.mkdtemp(prefix=prefix, dir=_PARENT)
