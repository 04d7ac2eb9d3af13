"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither this
module nor the whitebox_tools_ray library calls ``ray.init()``/
``ray.shutdown()`` (only bench.py, CLI entry points and the pytest session
fixture own a Ray session).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship spatial-join + tiling pipeline on sf0.001: stream points ->
    broadcast polygon clip -> cell encode -> grouped rollup per cell."""
    from whitebox_tools_ray.pipelines.queries import QUERIES

    return QUERIES["clip_cell_rollup"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md section 2."""
    from whitebox_tools_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only ops
    (MinHash/SimHash/LSH dedup, language ID, fingerprints) are omitted and
    verified by brute-force oracles in tests/ instead."""
    from whitebox_tools_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
