"""math_stat/image sweep #7: AttributeCorrelationNeighbourhoodAnalysis
and ModifiedKMeansClustering.

The windowed attribute correlation is exact: per-point Pearson r between
integer value-cents and the derived second attribute over the points
within radius 3 — integer sufficient sums via the FRS cell-bin exchange,
finished with one shared float tree. Modified k-means is rows-only
(deterministic k-means + small-cluster dissolution; rerun-equality oracle
in tests/test_mathops4.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..pointdefs import PTS_CTE
from ..sources.tables import read_points, read_table
from .queries import query

_R = 3.0
_R2 = 9.0


@query(
    "attribute_correlation_neighbourhood",
    f"""
    WITH {PTS_CTE},
    ap AS MATERIALIZED (
      SELECT event_id, x, y,
             CAST(FLOOR(x / {_R!r}) AS BIGINT) * 1000
             + CAST(FLOOR(y / {_R!r}) AS BIGINT) AS cell,
             CAST(ROUND(value * 100) AS BIGINT) AS a,
             (event_id * 733) % 1000 AS b
      FROM pts
    ),
    pairs AS (
      {" UNION ALL ".join(
          f"SELECT p.event_id, q.a, q.b FROM ap p JOIN ap q "
          f"ON q.cell = p.cell + {di * 1000 + dj} "
          f"WHERE (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) "
          f"<= {_R2!r}"
          for di in (-1, 0, 1) for dj in (-1, 0, 1))}
    ),
    s AS (
      SELECT event_id, COUNT(*) AS n, SUM(a) AS s1, SUM(b) AS s2,
             SUM(a * a) AS s11, SUM(b * b) AS s22, SUM(a * b) AS s12
      FROM pairs GROUP BY event_id
    )
    SELECT event_id,
           (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
           / sqrt((CAST(s11 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  * (CAST(s22 AS DOUBLE)
                     - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)) AS r
    FROM s
    WHERE n >= 3
      AND (CAST(s11 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) > 0
      AND (CAST(s22 AS DOUBLE)
           - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n) > 0
    """,
)
def attribute_correlation_neighbourhood(sf_dir: str):
    """AttributeCorrelationNeighbourhoodAnalysis (math_stat_analysis/
    attribute_correlation_neighbourhood_analysis.rs): the FRS cell-bin
    exchange — each point lands in its 3-unit cell, replicates to the 8
    neighbouring cells as a candidate, and per-cell vectorized pair sums
    stay integer-exact."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        e = df["event_id"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        a = np.round(df["value"].to_numpy(np.float64) * 100).astype(np.int64)
        b = (e * 733) % 1000
        ci = np.floor(x / _R).astype(np.int64)
        cj = np.floor(y / _R).astype(np.int64)
        frames = []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                frames.append(pd.DataFrame({
                    "cell": (ci + di) * 1000 + (cj + dj),
                    "owner": np.int64(1) if di == 0 and dj == 0 else np.int64(0),
                    "event_id": e, "x": x, "y": y, "a": a, "b": b}))
        return pd.concat(frames, ignore_index=True)

    pts = read_points(sf_dir).map_batches(emit, batch_format="pandas")

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["owner"] == 1]
        if not len(own):
            return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                                 **{c: pd.Series([], dtype=np.int64)
                                    for c in ("n", "s1", "s2", "s11",
                                              "s22", "s12")}})
        ox = own["x"].to_numpy(np.float64)[:, None]
        oy = own["y"].to_numpy(np.float64)[:, None]
        qx = g["x"].to_numpy(np.float64)[None, :]
        qy = g["y"].to_numpy(np.float64)[None, :]
        # dedupe candidates: a point appears once as owner + replicas of
        # OTHER cells do not land here; within this cell group each
        # distinct point appears once per (owner/candidate) row — drop
        # duplicate event ids among candidates
        gq = g.drop_duplicates("event_id")
        qx = gq["x"].to_numpy(np.float64)[None, :]
        qy = gq["y"].to_numpy(np.float64)[None, :]
        qa = gq["a"].to_numpy(np.int64)
        qb = gq["b"].to_numpy(np.int64)
        d2 = (ox - qx) ** 2 + (oy - qy) ** 2
        m = d2 <= _R2
        n = m.sum(axis=1)
        s1 = (m * qa[None, :]).sum(axis=1)
        s2 = (m * qb[None, :]).sum(axis=1)
        s11 = (m * (qa * qa)[None, :]).sum(axis=1)
        s22 = (m * (qb * qb)[None, :]).sum(axis=1)
        s12 = (m * (qa * qb)[None, :]).sum(axis=1)
        return pd.DataFrame({"event_id": own["event_id"].to_numpy(np.int64),
                             "n": n, "s1": s1, "s2": s2, "s11": s11,
                             "s22": s22, "s12": s12})

    from ..relational import keyed_map_groups

    sums = keyed_map_groups(pts, "cell", cell_pairs)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64).astype(np.float64)
        s1 = df["s1"].to_numpy(np.int64).astype(np.float64)
        s2 = df["s2"].to_numpy(np.int64).astype(np.float64)
        s11 = df["s11"].to_numpy(np.int64).astype(np.float64)
        s22 = df["s22"].to_numpy(np.int64).astype(np.float64)
        s12 = df["s12"].to_numpy(np.int64).astype(np.float64)
        v1 = s11 - s1 * s1 / n
        v2 = s22 - s2 * s2 / n
        keep = (df["n"].to_numpy(np.int64) >= 3) & (v1 > 0) & (v2 > 0)
        with np.errstate(invalid="ignore"):
            r = (s12 - s1 * s2 / n) / np.sqrt(v1 * v2)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64)[keep],
            "r": r[keep]})

    out = sums.map_batches(finish, batch_format="pandas").materialize()
    if out.count() == 0:  # sparse clouds: no 3-point neighbourhood anywhere
        return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                             "r": pd.Series([], dtype=np.float64)})
    return out


_MKM_K, _MKM_MIN = 10, 40


@query("modified_k_means")
def modified_k_means(sf_dir: str):
    """ModifiedKMeansClustering (image_analysis/
    modified_k_means_clustering.rs): deterministic k-means (k=10), then
    clusters below the minimum size dissolve — their members take the
    nearest surviving centroid. Rows-only; rerun-equality oracle in
    tests/test_mathops4.py."""
    from ..stages.kmeans import _assign, _quantize, kmeans_fit

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents, assigns = kmeans_fit(emb, k=_MKM_K, iters=6)
    adf = assigns.to_pandas() if not isinstance(assigns, pd.DataFrame) \
        else assigns
    sizes = adf.groupby("cluster").size()
    small = set(int(c) for c in sizes[sizes < _MKM_MIN].index)
    keep_ids = np.array(sorted(set(range(len(cents))) - small), np.int64)
    if len(small) == 0 or len(keep_ids) == 0:
        return adf

    kept_cents = cents[keep_ids]

    # re-assign dissolved members on the distributed embeddings
    import ray as _ray

    from ..stages.spatial_join import _cached_get

    small_arr = np.fromiter(sorted(small), np.int64) \
        if small else np.empty(0, np.int64)
    ref = _ray.put((small_arr, keep_ids, kept_cents))
    amap = dict(zip(adf["vec_id"].astype(np.int64),
                    adf["cluster"].astype(np.int64)))
    aref = _ray.put(amap)

    def reassign(df: pd.DataFrame) -> pd.DataFrame:
        sm, kid, kc = _cached_get(ref)
        am = _cached_get(aref)
        vid = df["vec_id"].to_numpy(np.int64)
        cl = np.array([am[int(v)] for v in vid], np.int64)
        need = np.isin(cl, sm)
        if need.any():
            q = _quantize(np.stack(
                [np.asarray(v, np.float64) for v in
                 df["embedding"].to_numpy()[need]]))
            na = _assign(q, kc)
            cl[need] = kid[na]
        return pd.DataFrame({"vec_id": vid, "cluster": cl})

    return emb.map_batches(reassign, batch_format="pandas")
