"""Shared deterministic-polyline fixture constants (leaf module: imported
by queries_data3 AND queries_vector3, and shipped inside worker closures —
must never import pipelines.*; a cross-pipelines from-import breaks worker
deserialization through the pipelines.queries import cycle)."""

_L2P_N, _L2P_K, _L2P_SEED = 200, 8, 5150


# moved from pipelines/queries_hydro6 (leaf rule: consumed at
# decoration time by several pipeline modules)
from .layers import GRID1

def _dda_walk_sql(n: int, seed: int, name: str) -> str:
    """CTE ``{name}`` of distinct rasterized cell ids for a seeded layer."""
    return f"""
    {name}_snap AS (
      SELECT seg_id, CAST(floor(x0) AS BIGINT) AS cx0,
             CAST(floor(y0) AS BIGINT) AS cy0,
             CAST(floor(x1) AS BIGINT) AS cx1,
             CAST(floor(y1) AS BIGINT) AS cy1
      FROM {name}_seg),
    {name}_par AS (
      SELECT seg_id, cx0, cy0, cx1, cy1,
             GREATEST(ABS(cx1 - cx0), ABS(cy1 - cy0)) AS span,
             ABS(cx1 - cx0) AS adx, ABS(cy1 - cy0) AS ady,
             CASE WHEN cx1 >= cx0 THEN 1 ELSE -1 END AS sx,
             CASE WHEN cy1 >= cy0 THEN 1 ELSE -1 END AS sy
      FROM {name}_snap),
    {name}_steps AS (SELECT p.*, CAST(g.i AS BIGINT) AS i
                     FROM {name}_par p JOIN range(0, 20) g(i)
                     ON g.i <= p.span),
    {name}_walk AS (SELECT
        CASE WHEN adx >= ady THEN cx0 + i * sx
             ELSE cx0 + sx * ((2 * i * adx + ady) // (2 * ady)) END AS cx,
        CASE WHEN adx >= ady THEN
             CASE WHEN adx = 0 THEN cy0
                  ELSE cy0 + sy * ((2 * i * ady + adx) // (2 * adx)) END
             ELSE cy0 + i * sy END AS cy
      FROM {name}_steps),
    {name} AS MATERIALIZED (
      SELECT DISTINCT (84 - cy) * {GRID1.cols} + (cx + 180) AS cell_id
      FROM {name}_walk
      WHERE cy BETWEEN -85 AND 84 AND cx BETWEEN -180 AND 179)
    """
