"""Independent oracle for InsertDams: the filled dam profile is recomputed
through the closed-form water-level identity W[i] = max(p[i],
min(runmaxL[i], runmaxR[i])) instead of the reference's two sequential
passes, and the candidate argmax re-enumerated independently."""

import numpy as np

from whitebox_tools_ray.hydrodefs import _pour_cells
from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.rasterdefs import _value_fn

_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)
_P1 = (2, 3, 4, 1)
_P2 = (6, 7, 0, 5)
_ROWS, _COLS = GRID1.rows, GRID1.cols


def _z(r, c):
    if 0 <= r < _ROWS and 0 <= c < _COLS:
        return float(_value_fn(np.array([r * _COLS + c], np.int64))[0])
    return None


def _filled(prof):
    L = np.maximum.accumulate(prof)
    R = np.maximum.accumulate(prof[::-1])[::-1]
    w = np.maximum(prof, np.minimum(L, R))
    w[0], w[-1] = prof[0], prof[-1]
    return w


def _oracle_point(target, hdl):
    tr, tc = target // _COLS, target % _COLS
    dam_z = _z(tr, tc)
    plen = 2 * hdl + 1
    best = None
    for row in range(tr - hdl, tr + hdl + 1):
        for col in range(tc - hdl, tc + hdl + 1):
            z = _z(row, col)
            if z is None:
                continue
            for d in range(4):
                prof = np.zeros(plen)
                prof[hdl] = z
                hit, tcell = False, 0
                for i in range(1, hdl + 1):
                    rn = row + _DY[_P1[d]] * i
                    cn = col + _DX[_P1[d]] * i
                    if (rn, cn) == (tr, tc):
                        hit, tcell = True, hdl + i
                    v = _z(rn, cn)
                    prof[hdl + i] = v if v is not None else -np.inf
                    rn2 = row + _DY[_P2[d]] * i
                    cn2 = col + _DX[_P2[d]] * i
                    if (rn2, cn2) == (tr, tc):
                        hit, tcell = True, hdl - i
                    v = _z(rn2, cn2)
                    prof[hdl - i] = v if v is not None else -np.inf
                if not hit:
                    continue
                w = _filled(prof)
                if best is None or w[tcell] > best[0]:
                    best = (w[tcell], row, col, d, w)
    out = {}
    if best is None or best[0] <= dam_z:
        return out

    def put(r, c, v):
        if 0 <= r < _ROWS and 0 <= c < _COLS:
            k = r * _COLS + c
            out[k] = max(out.get(k, -np.inf), v)

    _h, drow, dcol, d, w = best
    hdl_ = hdl
    put(drow, dcol, w[hdl_])
    put(drow - 1, dcol, w[hdl_])
    for i in range(1, hdl_ + 1):
        rn = drow + _DY[_P1[d]] * i
        cn = dcol + _DX[_P1[d]] * i
        if _z(rn, cn) is not None:
            put(rn, cn, w[hdl_ + i])
            if d in (0, 2):
                put(rn - 1, cn, w[hdl_ + i])
        rn2 = drow + _DY[_P2[d]] * i
        cn2 = dcol + _DX[_P2[d]] * i
        if _z(rn2, cn2) is not None:
            put(rn2, cn2, w[hdl_ - i])
            if d in (0, 2):
                put(rn2 - 1, cn2, w[hdl_ - i])
    return out


def test_insert_dams_matches_water_level_identity(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro10 import insert_dams

    want = {}
    for t in _pour_cells().astype(np.int64).tolist():
        for k, v in _oracle_point(t, 7).items():
            want[k] = max(want.get(k, -np.inf), v)

    got = insert_dams("/root/testdata/sf0.001").to_pandas() \
        .sort_values("cell_id")
    assert len(got) == _ROWS * _COLS
    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64))
    exp = z.copy()
    for k, v in want.items():
        exp[k] = max(exp[k], v)
    assert len(want) > 50  # the dams actually raise cells
    np.testing.assert_allclose(got["zdam"].to_numpy(), exp, rtol=0, atol=0)


def test_impoundment_index_flood_fixpoint(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro10 import (
        _best_dam, _d8_down_local, impoundment_index)

    got = impoundment_index("/root/testdata/sf0.001").to_pandas() \
        .sort_values("pour_id")
    assert len(got) == 12
    assert (got["area"] >= 0).all()

    # whole-grid vectorized fixpoint re-derivation of the flood region
    cells = np.arange(_ROWS * _COLS, dtype=np.int64)
    down = _d8_down_local(cells // _COLS, cells % _COLS)
    z = _value_fn(cells)
    some_flood = False
    for pid, t in enumerate(_pour_cells().astype(np.int64).tolist()):
        best = _best_dam(int(t))
        tz = z[t]
        row = got[got["pour_id"] == pid].iloc[0]
        if best is None or best[0] <= tz:
            assert row["area"] == 0
            continue
        crest = best[0]
        R = np.zeros(len(cells), bool)
        R[t] = True
        while True:
            grow = ~R & (z < crest) & np.isin(down, cells[R])
            if not grow.any():
                break
            R |= grow
        assert row["area"] == int(R.sum())
        np.testing.assert_allclose(row["volume"],
                                   float((crest - z[R]).sum()))
        if R.sum() > 1:
            some_flood = True
    assert some_flood
