"""Raster expression engine (whitebox-plugins/src/{conditional_evaluation,
raster_calculator}/main.rs): evaluate an arithmetic/conditional expression
over one or more co-registered rasters, tile-parallel.

The expression is compiled once per worker call and evaluated vectorized on
whole tiles; names in the expression bind to the input rasters, plus
`where(cond, a, b)` for the conditional form (conditional_evaluation's
value = IF cond THEN a ELSE b). Inputs are pure value functions of the cell
id (the repo's raster convention), so tiles need no exchange.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..grid import GridSpec

_ALLOWED = {
    "where": np.where,
    "abs": np.abs,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "sqrt": np.sqrt,
    "floor": np.floor,
}


def raster_expression(grid: GridSpec, inputs: dict, expr: str, *,
                      tile: int = 64) -> ray.data.Dataset:
    """Dataset (cell_id, value): `expr` evaluated per cell over the named
    input rasters. `inputs` maps expression names to value functions
    fn(cell_ids) -> int64 array."""
    code = compile(expr, "<raster-expression>", "eval")
    for name in code.co_names:
        if name not in inputs and name not in _ALLOWED:
            raise ValueError(f"unknown name in raster expression: {name}")
    tcols = -(-grid.cols // tile)
    trows = -(-grid.rows // tile)

    def eval_tiles(batch: dict) -> pd.DataFrame:
        outs = []
        for tid in batch["id"]:
            tr, tc = int(tid) // tcols, int(tid) % tcols
            r0, c0 = tr * tile, tc * tile
            nr = min(tile, grid.rows - r0)
            nc = min(tile, grid.cols - c0)
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = (rr * grid.cols + cc).ravel()
            env = {name: np.asarray(fn(cid), np.int64)
                   for name, fn in inputs.items()}
            val = eval(code, {"__builtins__": {}}, {**_ALLOWED, **env})
            outs.append(pd.DataFrame({
                "cell_id": cid,
                "value": np.asarray(val, np.int64)}))
        return pd.concat(outs, ignore_index=True)

    return ray.data.range(trows * tcols, override_num_blocks=8) \
        .map_batches(eval_tiles, batch_format="numpy")
