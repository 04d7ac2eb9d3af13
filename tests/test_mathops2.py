"""Guard-band proof for the micro-rounded transcendental oracles
(queries_mathops2): the rounding contract is deterministic-safe iff, for
every distinct input value, |f|*1e6 + 0.5 sits far from a floor boundary
relative to the cross-library (numpy vs DuckDB libm) disagreement. Measured
disagreement is <= ~1e-8 scaled units; we assert a >= 1e-6 margin (1000x)."""

import duckdb
import numpy as np

from whitebox_tools_ray.pipelines.queries_mathops2 import _TRIG


def _domains():
    a = np.arange(-500, 501).astype(np.float64)  # all distinct band values
    b = np.arange(-500, 501).astype(np.float64)
    return a, b


def test_guard_band_margin():
    a, b = _domains()
    for name, fn, _expr in _TRIG:
        v = np.abs(fn(a, b)) * 1e6 + 0.5
        margin = np.min(np.abs(v - np.round(v)))
        assert margin > 1e-6, f"{name}: margin {margin:.3e} too small"


def test_numpy_duckdb_micro_rounding_agrees():
    a, b = _domains()
    con = duckdb.connect()
    for name, fn, expr in _TRIG:
        npv = fn(a, b)
        got = con.execute(
            f"SELECT {expr} AS v FROM (SELECT unnest(?::DOUBLE[]) AS a, "
            f"unnest(?::DOUBLE[]) AS b)",
            [a.tolist(), b.tolist()]).fetchnumpy()["v"]
        ra = np.where(npv >= 0, np.floor(npv * 1e6 + 0.5),
                      -np.floor(-npv * 1e6 + 0.5))
        rb = np.where(got >= 0, np.floor(got * 1e6 + 0.5),
                      -np.floor(-got * 1e6 + 0.5))
        assert np.array_equal(ra, rb), f"{name}: rounded values diverge"
