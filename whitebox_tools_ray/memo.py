"""Per-Ray-session memoization of shared materialized intermediates.

Several registry entries compose the same expensive sub-pipeline — the
whole stream-network family (stream_network_analysis/*.rs analogs) starts
from stream_link_id's accumulation + junction cut + link walk, and the
link-DAG orders all start from the same link attribute table. Materialized
Datasets are immutable, so reusing one across entries in the same driver
process is safe and is the design a shared cluster deployment would use
(compute the network index once, serve every downstream query from it).

The cache key includes the Ray job id so a fresh ``ray.init()`` (new
object store — all previous ObjectRefs dead) never sees stale entries,
plus a cheap data fingerprint of every path-like argument (mtime + size
of the files under it) so regenerating the data at the same path within
a live session invalidates the entry instead of silently serving stale
results. Callers can also force recomputation with :func:`clear`.
Leaf module: imports nothing from the package (worker-closure import
rules; this cache is driver-side only).
"""

from __future__ import annotations

import functools
import os

_MEMO: dict = {}


def _job_key():
    try:
        import ray

        if ray.is_initialized():
            # the GCS address is unique per cluster instance; job ids are
            # NOT (a fresh local cluster restarts them at the same value,
            # so a driver cycling ray.shutdown()/ray.init() would be
            # served dead ObjectRefs under a job-id key)
            return ray.get_runtime_context().gcs_address
    except Exception:  # pragma: no cover - ray not importable
        pass
    return None


def _fingerprint(arg):
    """Cheap content fingerprint for path-like string args.

    For a directory: (name, size, mtime_ns) of its direct regular files
    (the parquet tables live flat under sf_dir). For a file: (size,
    mtime_ns). Non-path args fingerprint as None — they are already part
    of the key by value.
    """
    if not isinstance(arg, (str, os.PathLike)):
        return None
    try:
        if os.path.isdir(arg):
            entries = []
            with os.scandir(arg) as it:
                for e in it:
                    if e.is_file():
                        st = e.stat()
                        entries.append((e.name, st.st_size, st.st_mtime_ns))
            return tuple(sorted(entries))
        if os.path.isfile(arg):
            st = os.stat(arg)
            return (st.st_size, st.st_mtime_ns)
    except OSError:
        return None
    return None


def _evict_dead_jobs(job):
    """Drop entries from previous Ray sessions — their ObjectRefs are dead
    and pinning them only leaks driver memory across init/shutdown cycles."""
    dead = [k for k in _MEMO if k[-1] != job]
    for k in dead:
        del _MEMO[k]


def clear():
    """Drop every memoized entry (force recomputation within a session)."""
    _MEMO.clear()


def session_memo(fn):
    """Memoize ``fn(*args)`` per (args, data fingerprint, live Ray session).

    Only for functions returning immutable values (materialized Datasets,
    frozen driver-side tables). Positional args must be hashable. Path-like
    string args contribute a (size, mtime) fingerprint so same-path data
    regeneration invalidates the entry; entries from dead Ray jobs are
    evicted on the next call.
    """

    @functools.wraps(fn)
    def wrapper(*args):
        job = _job_key()
        _evict_dead_jobs(job)
        fp = tuple(_fingerprint(a) for a in args)
        key = (fn.__module__, fn.__qualname__, args, fp, job)
        if key not in _MEMO:
            _MEMO[key] = fn(*args)
        return _MEMO[key]

    wrapper.__wrapped__ = fn
    return wrapper
