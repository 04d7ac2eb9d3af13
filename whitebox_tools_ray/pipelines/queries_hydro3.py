"""Hydro additions #3: AverageUpslopeFlowpathLength and Strahler-order
basins, composing the shard-pool primitives (accumulation, weighted
accumulation, strahler, cut-graph basins) with recursive-CTE oracles over
the shared D8 graph CTEs."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hydrodefs import (_GRAPH_CTES, _HOP_DIAG, _HOP_STRAIGHT,
                         _STREAM_CTES, _WALK_UNITS_CTE, _d8_pointer,
                         _dest_in_stream, _stream_cut_graphs)
from ..layers import GRID1
from .queries import query


def _hops(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fixed-point D8 hop lengths — defined locally (not imported from
    queries_stream2) because this function ships inside worker closures;
    a cross-module reference would make workers entry-import
    queries_stream2 and hit the pipelines.queries import cycle."""
    diag = (a // GRID1.cols != b // GRID1.cols) & (a % GRID1.cols != b % GRID1.cols)
    return np.where(diag, np.int64(_HOP_DIAG), np.int64(_HOP_STRAIGHT))


@query(
    "avg_upslope_flowpath",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE}
    SELECT cur AS cell_id, CAST(SUM(units) AS BIGINT) AS auf_units,
           COUNT(*) AS n_up
    FROM walku WHERE units > 0 GROUP BY cur
    """,
)
def avg_upslope_flowpath(sf_dir: str):
    """AverageUpslopeFlowpathLength
    (hydro_analysis/average_upslope_flowpath_length.rs): per cell the SUM of D8 flowpath lengths from every strictly
    upstream cell plus the upstream-cell count (mean = auf_units / n_up;
    integer sufficient statistics keep the contract exact). Identity: an
    edge (a->b) lies on the path u->cell once for every u upstream-or-equal
    a, so seeding mass(b) = sum_a hop(a,b) * acc(a) and running the plain
    accumulation sum-drain yields the path-length sum — two Pregel waves
    (count accumulation, then weighted accumulation), no per-path walks.
    Cells with no upstream neighbours are nodata (absent)."""
    from ..relational import partial_agg
    from ..stages.flow import down_ds_from_pointer, tile_of_expr
    from ..stages.pregel import (flow_accumulation_pregel,
                                 weighted_accumulation_pregel)

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    acc = flow_accumulation_pregel(dds, GRID1)
    j = dds.join(acc, join_type="inner", num_partitions=8, on=("cell_id",))

    def emit_masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        t = df["tile"].to_numpy(np.int64)
        a = df["acc"].to_numpy(np.int64)
        base = pd.DataFrame({"cell_id": cid, "tile": t,
                             "mass": np.zeros(len(cid), np.int64)})
        m = down >= 0
        incr = pd.DataFrame({"cell_id": down[m],
                             "tile": tile_of_expr(down[m], GRID1, 64),
                             "mass": _hops(cid[m], down[m]) * a[m]})
        return pd.concat([base, incr], ignore_index=True)

    masses = partial_agg(j.map_batches(emit_masses, batch_format="pandas"),
                         ["cell_id", "tile"], [("mass", "sum", "mass")])
    # weighted result is (cell_id, acc); rename to wacc so the join with the
    # count accumulation (also named acc) has unambiguous columns
    wsum = weighted_accumulation_pregel(dds, masses, GRID1).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "wacc": df["acc"].to_numpy(np.int64)}),
        batch_format="pandas")
    out = wsum.join(acc, join_type="inner", num_partitions=8, on=("cell_id",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n_up = df["acc"].to_numpy(np.int64) - 1
        keep = n_up >= 1
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64)[keep],
            "auf_units": df["wacc"].to_numpy(np.int64)[keep],
            "n_up": n_up[keep]})

    return out.map_batches(finish, batch_format="pandas")


from ..hydrodefs import _SB_LEVELS, _SB_ORD  # noqa: E402 (leaf module)


@query(
    "strahler_order_basins",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_SB_LEVELS}
    SELECT w.start AS cell_id,
           CAST({_SB_ORD.format(cell="w.cur")} AS BIGINT) AS basin_order
    FROM walk2 w
    JOIN stream st ON st.cell_id = w.cur
    """,
)
def strahler_order_basins(sf_dir: str):
    """StrahlerOrderBasins (hydro_analysis/strahler_basins.rs): label every
    cell with the Strahler order of the stream its D8 path first reaches —
    the subbasins destination machinery joined with the Pregel Strahler
    wave at the entry stream cell (order is constant along a link, so the
    entry cell's order IS the link's). Cells draining to a non-stream
    outlet are nodata (absent)."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import basins_pregel, strahler_pregel

    sx = strahler_pregel(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1).map_batches(
        lambda df: pd.DataFrame({
            "dest": df["cell_id"].to_numpy(np.int64),
            "basin_order": df["strahler"].to_numpy(np.int64)}),
        batch_format="pandas")
    cut_ds, sref = _stream_cut_graphs(sf_dir)
    keep = _dest_in_stream(basins_pregel(cut_ds.materialize(), GRID1), sref)
    j = keep.join(sx, join_type="inner", num_partitions=8, on=("dest",))
    return j.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "basin_order": df["basin_order"].to_numpy(np.int64)}),
        batch_format="pandas")
