"""Polyline / segment intersection (V family entry point).

Reference: LineIntersections (gis_analysis/line_intersections.rs) and the
overlay splitter find_split_points_at_line_intersections
(whitebox-common/src/algorithms/line_ops.rs:138). Semantics implemented:
PROPER crossings of two segments (strict interior intersection on both,
via orientation sign tests); collinear overlaps and shared endpoints are not
reported (documented divergence; the reference splitter also handles touch
cases for overlay rebuilds — round-2 scope).

Distributed plan: segments are binned into FRS cells by their bounding box
coverage; a ``groupby(cell)`` co-locates candidate pairs; each pair is
tested exactly; the intersection is reported EXACTLY ONCE by the ownership
rule "only the cell containing the intersection point emits it" — the
standard dedup for spatial-join replication.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..cells import frs_bin, pack_bin


def segment_intersections(p0, p1, q0, q1):
    """Vectorized proper-crossing test + intersection points.

    p0, p1, q0, q1: (n, 2) arrays; returns (mask, ix, iy). A proper crossing
    has the endpoints of each segment strictly on opposite sides of the
    other's supporting line (is_left sign products < 0 — the same primitive
    as poly_ops.rs is_left)."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    q0 = np.asarray(q0, np.float64)
    q1 = np.asarray(q1, np.float64)

    def cross(a, b, c):
        return (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - \
               (c[:, 0] - a[:, 0]) * (b[:, 1] - a[:, 1])

    d1 = cross(q0, q1, p0)
    d2 = cross(q0, q1, p1)
    d3 = cross(p0, p1, q0)
    d4 = cross(p0, p1, q1)
    mask = (d1 * d2 < 0) & (d3 * d4 < 0)
    denom = d1 - d2
    t = np.where(denom != 0, d1 / np.where(denom == 0, 1.0, denom), 0.0)
    ix = p0[:, 0] + t * (p1[:, 0] - p0[:, 0])
    iy = p0[:, 1] + t * (p1[:, 1] - p0[:, 1])
    return mask, ix, iy


def synth_segments(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic localized segments (length <= ~3 units) world-wide."""
    from ..sources.synthetic import splitmix64

    ids = np.arange(n, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B9))

    def unit(off):
        return (splitmix64(h + np.uint64(off)) % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30)

    x0 = unit(1) * 360.0 - 180.0
    y0 = unit(2) * 170.0 - 85.0
    x1 = x0 + (unit(3) - 0.5) * 6.0
    y1 = y0 + (unit(4) - 0.5) * 6.0
    return pd.DataFrame({"seg_id": ids, "x0": x0, "y0": y0, "x1": x1, "y1": y1})


def line_intersections(segments_ds, *, cell_size: float = 4.0):
    """All proper pairwise crossings, exactly once each.

    Output: seg_a, seg_b (seg_a < seg_b), ix, iy.
    """
    radius = cell_size * 2.0  # frs_bin uses radius/2 as the bin side

    def bin_segments(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in df.itertuples():
            bx0, bx1 = sorted((frs_bin(np.array([r.x0]), radius)[0],
                               frs_bin(np.array([r.x1]), radius)[0]))
            by0, by1 = sorted((frs_bin(np.array([r.y0]), radius)[0],
                               frs_bin(np.array([r.y1]), radius)[0]))
            for bi in range(int(bx0), int(bx1) + 1):
                for bj in range(int(by0), int(by1) + 1):
                    rows.append((int(pack_bin(np.array([bi]), np.array([bj]))[0]),
                                 r.seg_id, r.x0, r.y0, r.x1, r.y1))
        return pd.DataFrame(rows, columns=["cell", "seg_id", "x0", "y0", "x1", "y1"])

    binned = segments_ds.map_batches(bin_segments, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("seg_id").sort_values("seg_id")
        n = len(g)
        empty = pd.DataFrame({"seg_a": pd.Series([], dtype=np.int64),
                              "seg_b": pd.Series([], dtype=np.int64),
                              "ix": pd.Series([], dtype=np.float64),
                              "iy": pd.Series([], dtype=np.float64)})
        if n < 2:
            return empty
        ia, ib = np.triu_indices(n, k=1)
        P0 = g[["x0", "y0"]].to_numpy()
        P1 = g[["x1", "y1"]].to_numpy()
        mask, ix, iy = segment_intersections(P0[ia], P1[ia], P0[ib], P1[ib])
        if not mask.any():
            return empty
        ids = g["seg_id"].to_numpy(np.int64)
        ix, iy = ix[mask], iy[mask]
        # exactly-once ownership: only the cell containing the intersection
        # point reports it
        own = pack_bin(frs_bin(ix, radius), frs_bin(iy, radius)) == int(g["cell"].iloc[0])
        return pd.DataFrame({"seg_a": ids[ia[mask]][own], "seg_b": ids[ib[mask]][own],
                             "ix": ix[own], "iy": iy[own]})

    return binned.groupby("cell").map_groups(pairs, batch_format="pandas")
