"""Clump (connected components) vs a brute-force BFS oracle, including
components spanning multiple tiles (border-merge path) and diagonal
(8-connected) linkage."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.grid import GridSpec

G = GridSpec(west=0.0, north=40.0, res_x=1.0, res_y=1.0, rows=40, cols=60)
TILE = 16


def brute_clump(z: np.ndarray, nodata: float = -32768.0) -> dict[int, int]:
    """cell_id -> component min cell_id via BFS, 8-connected equal values."""
    rows, cols = z.shape
    valid = (z != 0.0) & (z != nodata) & ~np.isnan(z)
    seen = np.zeros_like(valid)
    out = {}
    for r in range(rows):
        for c in range(cols):
            if not valid[r, c] or seen[r, c]:
                continue
            comp = []
            stack = [(r, c)]
            seen[r, c] = True
            while stack:
                cr, cc = stack.pop()
                comp.append(cr * cols + cc)
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        nr2, nc2 = cr + dr, cc + dc
                        if 0 <= nr2 < rows and 0 <= nc2 < cols and \
                                valid[nr2, nc2] and not seen[nr2, nc2] and \
                                z[nr2, nc2] == z[cr, cc]:
                            seen[nr2, nc2] = True
                            stack.append((nr2, nc2))
            m = min(comp)
            for cid in comp:
                out[cid] = m
    return out


def make_pattern() -> np.ndarray:
    z = np.zeros((G.rows, G.cols))
    # patch spanning >= 2 tiles horizontally (crosses col 16 boundary)
    z[5:10, 10:25] = 7.0
    # diagonal-linked patch crossing the (16,16) tile corner
    for k in range(12, 22):
        z[k, k] = 3.0
    # two same-valued patches NOT connected (must get distinct clump ids)
    z[30:33, 5:8] = 7.0
    # patch with nodata inside
    z[25:29, 40:46] = 9.0
    z[26, 42] = -32768.0
    # single-cell patch
    z[38, 58] = 5.0
    # a big patch spanning 4 tiles
    z[12:22, 28:40] = 2.0
    return z


@pytest.mark.usefixtures("ray_session")
def test_clump_matches_bruteforce():
    import ray.data

    from whitebox_tools_ray.stages.clump import clump

    z = make_pattern()

    # build the tile dataset from the pattern
    tcols = -(-G.cols // TILE)
    trows = -(-G.rows // TILE)
    rows = []
    for tr in range(trows):
        for tc in range(tcols):
            r0, c0 = tr * TILE, tc * TILE
            nr = min(TILE, G.rows - r0)
            nc = min(TILE, G.cols - c0)
            rows.append({"tile_id": tr * tcols + tc, "trow": tr, "tcol": tc,
                         "nrows": nr, "ncols": nc,
                         "data": z[r0:r0 + nr, c0:c0 + nc].ravel()})
    tiles = ray.data.from_pandas(pd.DataFrame(rows))

    got = clump(tiles, G, tile=TILE).to_pandas().sort_values("cell_id").reset_index(drop=True)
    want = brute_clump(z)

    assert len(got) == len(want)
    got_map = dict(zip(got["cell_id"].astype(int), got["clump_id"].astype(int)))
    assert got_map == want
    # distinct disconnected same-valued patches keep distinct ids
    id_a = got_map[5 * G.cols + 10]
    id_b = got_map[30 * G.cols + 5]
    assert id_a != id_b
    # diagonal patch is ONE component (8-connectivity)
    diag_ids = {got_map[k * G.cols + k] for k in range(12, 22)}
    assert len(diag_ids) == 1
