"""Per-Ray-session memoization of shared materialized intermediates.

Several registry entries compose the same expensive sub-pipeline — the
whole stream-network family (stream_network_analysis/*.rs analogs) starts
from stream_link_id's accumulation + junction cut + link walk, and the
link-DAG orders all start from the same link attribute table. Materialized
Datasets are immutable, so reusing one across entries in the same driver
process is safe and is the design a shared cluster deployment would use
(compute the network index once, serve every downstream query from it).

The cache key includes the Ray job id so a fresh ``ray.init()`` (new
object store — all previous ObjectRefs dead) never sees stale entries.
Leaf module: imports nothing from the package (worker-closure import
rules; this cache is driver-side only).
"""

from __future__ import annotations

import functools

_MEMO: dict = {}


def _job_key():
    try:
        import ray

        if ray.is_initialized():
            return ray.get_runtime_context().get_job_id()
    except Exception:  # pragma: no cover - ray not importable
        pass
    return None


def session_memo(fn):
    """Memoize ``fn(*args)`` per (args, live Ray session).

    Only for functions returning immutable values (materialized Datasets,
    frozen driver-side tables). Positional args must be hashable.
    """

    @functools.wraps(fn)
    def wrapper(*args):
        key = (fn.__module__, fn.__qualname__, args, _job_key())
        if key not in _MEMO:
            _MEMO[key] = fn(*args)
        return _MEMO[key]

    wrapper.__wrapped__ = fn
    return wrapper
