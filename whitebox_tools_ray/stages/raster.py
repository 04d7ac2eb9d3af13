"""Tile-aligned raster datasets + halo-exchange stencil operators (M2).

A raster is a Dataset of tiles (SURVEY.md section 1.1):
    {tile_id: int64, trow: int32, tcol: int32, nrows: int32, ncols: int32,
     data: list<float64>}   (row-major within the tile)

Stencil operators (mean filter, slope, ...; image_analysis/mean_filter.rs:
301-337, terrain_analysis/slope.rs:272-326) need a k-cell apron around each
tile. Ray Data has no built-in halo exchange; the explicit plan is:

    tiles -> flat_map: emit (target_tile, fragment) for self + 8 neighbours
          -> groupby(target_tile) -> map_groups: assemble padded array,
             run the vectorized kernel on the interior, emit result tile

which is exactly the reference's tile-halo re-read pattern
(lidar_analysis/lidar_idw_interpolation.rs:578-600) turned into a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..grid import GridSpec


def synth_raster_tiles(grid: GridSpec, value_fn, *, tile: int = 64) -> ray.data.Dataset:
    """Deterministic raster from value_fn(cell_id ndarray) -> value ndarray,
    generated tile-parallel (any shard independently)."""
    trows = -(-grid.rows // tile)
    tcols = -(-grid.cols // tile)
    ids = ray.data.range(trows * tcols, override_num_blocks=max(2, trows))

    def gen(batch: dict) -> pd.DataFrame:
        # one value_fn call per tile SHAPE, not per tile (the per-tile
        # meshgrid loop cost ~1 ms/tile — 1.5 s of a 3 s stencil bench
        # entry at 1539 tiles)
        tids = batch["id"].astype(np.int64)
        tr = tids // tcols
        tc = tids % tcols
        r0 = tr * tile
        c0 = tc * tile
        nr = np.minimum(tile, grid.rows - r0)
        nc = np.minimum(tile, grid.cols - c0)
        out = []
        for snr, snc in sorted(set(zip(nr.tolist(), nc.tolist()))):
            m = (nr == snr) & (nc == snc)
            rr, cc = np.meshgrid(np.arange(snr), np.arange(snc),
                                 indexing="ij")
            base = (rr.astype(np.int64) * grid.cols
                    + cc.astype(np.int64)).ravel()
            origin = (r0[m] * grid.cols + c0[m]).astype(np.int64)
            vals = value_fn((origin[:, None] + base[None, :]).ravel()) \
                .astype(np.float64).reshape(len(origin), -1)
            for j in range(len(origin)):
                out.append({"tile_id": int(tids[m][j]),
                            "trow": int(tr[m][j]), "tcol": int(tc[m][j]),
                            "nrows": snr, "ncols": snc, "data": vals[j]})
        return pd.DataFrame(out)

    return ids.map_batches(gen, batch_format="numpy")


def window_exchange(tiles_ds: ray.data.Dataset, grid: GridSpec, window_fn, *,
                    tile: int = 64, k: int = 1):
    """k-cell halo exchange delivering each tile's padded window to
    ``window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame`` — the general
    primitive under stencil_k; window_fn may emit arbitrary rows (e.g.
    breach carves that modify HALO cells of neighbouring tiles)."""
    tcols = -(-grid.cols // tile)
    trows = -(-grid.rows // tile)

    def emit_fragments(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            arr = np.asarray(t["data"], np.float64).reshape(nr, nc)
            tr, tc = int(t["trow"]), int(t["tcol"])
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    ntr, ntc = tr + dr, tc + dc
                    if not (0 <= ntr < trows and 0 <= ntc < tcols):
                        continue
                    # the strip of THIS tile that neighbour (ntr,ntc) needs
                    rs = slice(0, nr) if dr == 0 else \
                        (slice(max(nr - k, 0), nr) if dr == 1 else slice(0, min(k, nr)))
                    cs = slice(0, nc) if dc == 0 else \
                        (slice(max(nc - k, 0), nc) if dc == 1 else slice(0, min(k, nc)))
                    frag = arr[rs, cs]
                    rows.append({
                        "tile_id": ntr * tcols + ntc,
                        "src_trow": tr, "src_tcol": tc,
                        "r_off": rs.start, "c_off": cs.start,
                        "fr": frag.shape[0], "fc": frag.shape[1],
                        "frag": frag.ravel(),
                    })
        return pd.DataFrame(rows)

    frags = tiles_ds.map_batches(emit_fragments, batch_format="pandas")

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tile_id"].iloc[0])
        tr, tc = tid // tcols, tid % tcols
        r0, c0 = tr * tile, tc * tile
        nr = min(tile, grid.rows - r0)
        nc = min(tile, grid.cols - c0)
        padded = np.full((nr + 2 * k, nc + 2 * k), np.nan)
        for _, f in g.iterrows():
            frag = np.asarray(f["frag"], np.float64).reshape(int(f["fr"]), int(f["fc"]))
            # absolute raster coords of the fragment origin
            ar = int(f["src_trow"]) * tile + int(f["r_off"])
            ac = int(f["src_tcol"]) * tile + int(f["c_off"])
            pr = ar - r0 + k
            pc = ac - c0 + k
            padded[pr:pr + frag.shape[0], pc:pc + frag.shape[1]] = frag
        return window_fn(padded, nr, nc, r0, c0)

    # materialize the assembled output: when the groupby's AllToAll shares
    # one streaming graph with a downstream exchange (partial_agg's tree
    # merge, a re-tile, a second stencil), Ray's resource manager reserves
    # budget for both and backpressures the middle operators — measured
    # 4.9 s -> 1.0 s for stencil_mean3x3_10x at 6.12M cells / 32 CPUs (the
    # same pathology class as checkpoint.checkpointed_write_inline_rollup's
    # documented 8-CPU collapse). The boundary holds tile TENSORS: grid-
    # bounded (cells x result keys), never data-bounded.
    return frags.groupby("tile_id").map_groups(
        assemble, batch_format="pandas").materialize()


def stencil_k(tiles_ds: ray.data.Dataset, grid: GridSpec, cell_kernel, *,
              tile: int = 64, k: int = 1, output: str = "cells"):
    """Apply a (2k+1)x(2k+1)-neighbourhood kernel over the raster with a
    k-cell halo exchange.

    cell_kernel(padded, nr, nc) receives a (nr+2k, nc+2k) float64 array (NaN
    outside the raster / missing halo) and returns a dict of per-cell result
    arrays of shape (nr, nc).

    output="tiles": one row PER TILE with each result key as a flat array
    column — the scale representation (no per-cell long format ever exists;
    downstream tile consumers aggregate/write tensors directly).
    output="cells" (default): the tile rows exploded to one row per cell
    with cell_id + result columns — the oracle-comparison boundary.
    """

    def window_fn(padded: np.ndarray, nr: int, nc: int, r0: int, c0: int) -> pd.DataFrame:
        res = cell_kernel(padded, nr, nc)
        row = {"trow": r0 // tile, "tcol": c0 // tile, "nrows": nr, "ncols": nc}
        for key, v in res.items():
            row[key] = np.asarray(v, np.float64).ravel()
        return pd.DataFrame([row])

    tiles_out = window_exchange(tiles_ds, grid, window_fn, tile=tile, k=k)
    if output == "tiles":
        return tiles_out

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        keys = [c for c in df.columns if c not in ("trow", "tcol", "nrows", "ncols")]
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * tile, int(t.tcol) * tile
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                                 indexing="ij")
            out = {"cell_id": (rr.astype(np.int64) * grid.cols
                               + cc.astype(np.int64)).ravel()}
            for key in keys:
                out[key] = np.asarray(getattr(t, key))
            frames.append(pd.DataFrame(out))
        return pd.concat(frames, ignore_index=True)

    return tiles_out.map_batches(explode, batch_format="pandas")


def stencil_3x3(tiles_ds: ray.data.Dataset, grid: GridSpec, cell_kernel, *, tile: int = 64):
    """3x3 special case of stencil_k (1-cell apron)."""
    return stencil_k(tiles_ds, grid, cell_kernel, tile=tile, k=1)


def stencil_tiles_as_input(tiles_out: ray.data.Dataset, grid: GridSpec, key: str, *,
                           tile: int = 64) -> ray.data.Dataset:
    """Adapt a stencil_k(output="tiles") result into the tiles_ds schema
    (tile_id/trow/tcol/nrows/ncols/data) so the NEXT stencil consumes it
    directly — chained stencils never materialize a per-cell long format
    (the round-2 critique: the cells path pays a full re-tile shuffle of
    n_cells rows between every pair of stencils)."""
    tcols = -(-grid.cols // tile)

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in df.itertuples():
            rows.append({"tile_id": int(t.trow) * tcols + int(t.tcol),
                         "trow": int(t.trow), "tcol": int(t.tcol),
                         "nrows": int(t.nrows), "ncols": int(t.ncols),
                         "data": np.asarray(getattr(t, key), np.float64)})
        return pd.DataFrame(rows)

    return tiles_out.map_batches(conv, batch_format="pandas")


def fuse_kernels(kern1, key1: str, kern2, k1: int, k2: int):
    """Compose two stencil kernels into ONE kernel over a (k1+k2) halo: the
    inner kernel evaluates on the (nr+2*k2, nc+2*k2) region (masked to
    in-grid positions), the outer consumes its output — a chained smoothing
    pays ONE halo exchange instead of two exchanges plus a per-cell re-tile
    shuffle (round-2 VERDICT item 5; the opening/closing morphology ops are
    the k1=k2=1 min/max instance of this)."""

    def fused(padded: np.ndarray, nr: int, nc: int) -> dict:
        inner = kern1(padded, nr + 2 * k2, nc + 2 * k2)[key1]
        centre = padded[k1:k1 + nr + 2 * k2, k1:k1 + nc + 2 * k2]
        inner = np.where(np.isnan(centre), np.nan, inner)
        return kern2(inner, nr, nc)

    return fused


def mean3x3_kernel(padded: np.ndarray, nr: int, nc: int) -> dict:
    """Sum + count of the 3x3 neighbourhood (incl. centre), NaN-aware —
    integer-exact when cell values are integers (mean = sum9/n9 left to the
    consumer; MeanFilter image_analysis/mean_filter.rs semantics on edges:
    only existing cells contribute)."""
    s = np.zeros((nr, nc))
    n = np.zeros((nr, nc), np.int64)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            w = padded[dr:dr + nr, dc:dc + nc]
            ok = ~np.isnan(w)
            s = s + np.where(ok, w, 0.0)
            n = n + ok.astype(np.int64)
    return {"sum9": s, "n9": n}


def aspect_hillshade_kernel_factory(res_x: float, res_y: float, *,
                                    azimuth_deg: float = 315.0,
                                    altitude_deg: float = 30.0):
    """Aspect (terrain_analysis/aspect.rs) + Hillshade
    (terrain_analysis/hillshade.rs) from the same Horn gradients:
    aspect = atan2(dzdy, -dzdx) mapped to compass degrees; hillshade =
    cos(zenith)cos(slope) + sin(zenith)sin(slope)cos(azimuth - aspect),
    clamped to [0, 1]."""
    az = np.radians(azimuth_deg)
    zen = np.radians(90.0 - altitude_deg)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded
        a = z[0:nr, 0:nc]; b = z[0:nr, 1:nc + 1]; c = z[0:nr, 2:nc + 2]
        d = z[1:nr + 1, 0:nc]; f = z[1:nr + 1, 2:nc + 2]
        g = z[2:nr + 2, 0:nc]; h = z[2:nr + 2, 1:nc + 1]; i = z[2:nr + 2, 2:nc + 2]
        dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * res_x)
        dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * res_y)
        slope = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
        aspect = np.arctan2(dzdy, -dzdx)
        compass = np.degrees(np.where(aspect < 0, aspect + 2 * np.pi, aspect))
        hs = np.cos(zen) * np.cos(slope) + \
            np.sin(zen) * np.sin(slope) * np.cos(az - aspect)
        return {"aspect_deg": compass, "hillshade": np.clip(hs, 0.0, 1.0)}

    return kern


def slope_kernel_factory(res_x: float, res_y: float):
    """Horn 3x3 slope (terrain_analysis/slope.rs): dz/dx, dz/dy via the
    8-neighbour weighted differences; edge cells (incomplete halo) -> NaN."""

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded
        a = z[0:nr, 0:nc]; b = z[0:nr, 1:nc + 1]; c = z[0:nr, 2:nc + 2]
        d = z[1:nr + 1, 0:nc]; f = z[1:nr + 1, 2:nc + 2]
        g = z[2:nr + 2, 0:nc]; h = z[2:nr + 2, 1:nc + 1]; i = z[2:nr + 2, 2:nc + 2]
        dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * res_x)
        dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * res_y)
        slope = np.degrees(np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy)))
        return {"slope_deg": slope}

    return kern


def cells_to_tiles(cells_ds: ray.data.Dataset, grid: GridSpec, value_col: str,
                   *, tile: int = 64, fill: float = np.nan) -> ray.data.Dataset:
    """Re-tile a per-cell Dataset (cell_id, value_col) into the dense tile
    schema (the inverse of stencil explode) — ONE keyed exchange routed by
    tile id; missing cells take ``fill``. This is how a COMPUTED raster
    (cost distance, accumulation, ...) re-enters the stencil machinery."""
    tcols = -(-grid.cols // tile)

    def route(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": cid,
            "val": df[value_col].to_numpy(np.float64),
            "tile_id": (cid // grid.cols // tile) * tcols
            + (cid % grid.cols // tile)})

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tile_id"].iloc[0])
        tr, tc = tid // tcols, tid % tcols
        r0, c0 = tr * tile, tc * tile
        nr = min(tile, grid.rows - r0)
        nc = min(tile, grid.cols - c0)
        data = np.full(nr * nc, fill, np.float64)
        cid = g["cell_id"].to_numpy(np.int64)
        rr = cid // grid.cols - r0
        cc = cid % grid.cols - c0
        data[rr * nc + cc] = g["val"].to_numpy(np.float64)
        return pd.DataFrame([{"tile_id": tid, "trow": tr, "tcol": tc,
                              "nrows": nr, "ncols": nc, "data": data}])

    return cells_ds.map_batches(route, batch_format="pandas") \
        .groupby("tile_id").map_groups(assemble, batch_format="pandas")
