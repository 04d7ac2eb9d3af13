"""Dense Jacobi oracle for the binary line-morphology sweep."""

import numpy as np

from whitebox_tools_ray.layers import GRID1

SF = "/root/testdata/sf0.001"
_ROWS, _COLS = GRID1.rows, GRID1.cols


def _dense(kind: str) -> np.ndarray:
    from whitebox_tools_ray.pipelines.queries_image6 import (_MAX_ITER,
                                                             _line_mask,
                                                             _patterns,
                                                             morph_pass_dense)

    z = _line_mask().reshape(_ROWS, _COLS)
    for _ in range(_MAX_ITER):
        before = z.copy()
        for elem, vals, target, new in _patterns(kind):
            z = morph_pass_dense(z, elem, vals, target, new)
        if np.array_equal(z, before):
            break
    return z


def _check(kind, fn, ray_session):
    want = _dense(kind)
    got = fn(SF).to_pandas()
    got_full = np.zeros(_ROWS * _COLS, np.int64)
    got_full[got["cell_id"].to_numpy(np.int64)] = 1
    assert np.array_equal(got_full.reshape(_ROWS, _COLS),
                          want.astype(np.int64))


def test_line_thin(ray_session):
    from whitebox_tools_ray.pipelines.queries_image6 import line_thin

    _check("thin", line_thin, ray_session)


def test_thicken_line(ray_session):
    from whitebox_tools_ray.pipelines.queries_image6 import thicken_line

    _check("thicken", thicken_line, ray_session)


def test_remove_spurs(ray_session):
    from whitebox_tools_ray.pipelines.queries_image6 import remove_spurs

    _check("spurs", remove_spurs, ray_session)
