"""Independent check of the link-DAG dynamic program behind Hack order /
main stem / topological order (pipelines/queries_stream2._link_orders):
brute-force enumeration of every headwater->link channel path on randomly
generated link trees, with the documented tie-break (max length, then lowest
headwater id). The cell-level outputs are covered by the DuckDB oracle
parity sweep; this pins the driver-side DP against a second implementation
that shares no code with it."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.pipelines.queries_stream2 import _link_orders, _LinkTable


def _random_link_forest(rng: np.random.Generator, n_links: int) -> pd.DataFrame:
    """A random forest of link trees: every internal node has >= 2 children
    (junction-headed), leaves are source-headed — the only shapes the link
    extraction can produce."""
    rows = []
    next_id = [0]

    def build(depth: int) -> int:
        lid = next_id[0]
        next_id[0] += 1
        n_children = 0
        if depth < 4 and next_id[0] < n_links and rng.random() < 0.6:
            n_children = int(rng.integers(2, 4))
        children = [build(depth + 1) for _ in range(n_children)]
        rows.append({
            "link_id": lid,
            "ilen": int(rng.integers(1, 50)) << 20,
            "head_cell": 10_000 + lid * 7 % 9973,
            "head_n": len(children) if children else 0,
            "n_cells": 1,
            "parent": -1,
            "hop_out": 0,
        })
        for c in children:
            for r in rows:
                if r["link_id"] == c:
                    r["parent"] = lid
                    r["hop_out"] = int(rng.integers(1, 3)) << 20
        return lid

    while next_id[0] < n_links:
        build(0)
    return pd.DataFrame(rows)


def _brute(links: pd.DataFrame) -> pd.DataFrame:
    L = links.set_index("link_id")
    children: dict[int, list[int]] = {}
    for lid, par in zip(L.index, L["parent"]):
        if par >= 0:
            children.setdefault(int(par), []).append(int(lid))

    def paths(l: int) -> list[tuple[int, int]]:
        """every (length-from-headwater-to-terminal, headwater) path."""
        ch = children.get(l, [])
        if not ch:
            return [(int(L.at[l, "ilen"]), int(L.at[l, "head_cell"]))]
        out = []
        for c in ch:
            for ln, h in paths(c):
                out.append((ln + int(L.at[c, "hop_out"]) + int(L.at[l, "ilen"]), h))
        return out

    chanlen, trib, depth = {}, {}, {}

    def fill_depth(l: int, d: int):
        depth[l] = d
        for c in children.get(l, []):
            fill_depth(c, d + 1)

    for l in L.index:
        p = paths(int(l))
        best = max(ln for ln, _ in p)
        chanlen[int(l)] = best
        trib[int(l)] = min(h for ln, h in p if ln == best)
    for l in L.index:
        if int(L.at[l, "parent"]) < 0:
            fill_depth(int(l), 0)

    hack = {}
    for l in L.index:
        cur, k = int(l), 0
        while int(L.at[cur, "parent"]) >= 0:
            par = int(L.at[cur, "parent"])
            if trib[cur] != trib[par]:
                k += 1
            cur = par
        hack[int(l)] = 1 + k

    out = L.copy()
    out["chanlen"] = [chanlen[int(l)] for l in L.index]
    out["trib"] = [trib[int(l)] for l in L.index]
    out["hack"] = [hack[int(l)] for l in L.index]
    out["topo"] = [depth[int(l)] + 1 for l in L.index]
    return out.reset_index()


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_link_orders_match_brute_force(seed):
    rng = np.random.default_rng(seed)
    links = _random_link_forest(rng, 40)
    dp = _link_orders(_LinkTable(None, None, None, links)) \
        .sort_values("link_id").reset_index(drop=True)
    bf = _brute(links).sort_values("link_id").reset_index(drop=True)
    for col in ["chanlen", "trib", "hack", "topo"]:
        assert dp[col].tolist() == bf[col].tolist(), col
    assert (dp["is_main"] == (dp["hack"] == 1).astype(np.int64)).all()


def test_hack_never_exceeds_topological():
    """switches on the downstream path are a subset of junction crossings,
    so Hack order <= topological order everywhere."""
    rng = np.random.default_rng(3)
    links = _random_link_forest(rng, 60)
    dp = _link_orders(_LinkTable(None, None, None, links))
    assert (dp["hack"] <= dp["topo"]).all()
