"""Resample bilinear/cc (IDW neighbourhood) vs a direct numpy replay of
the reference kernel (image_analysis/resample.rs:325-475), plus
mosaic_resample first-input-wins semantics."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.localrel import local_df
from whitebox_tools_spark.operators import enhance
from whitebox_tools_spark.operators.gridding import GridConfig

SRC = GridConfig(rows=6, cols=6, north=60.0, west=0.0, res_x=10.0, res_y=10.0)
DST = GridConfig(rows=9, cols=9, north=58.0, west=1.0, res_x=6.0, res_y=6.0)


def _src_cells():
    rng = np.random.RandomState(7)
    vals = rng.uniform(0.0, 100.0, (SRC.rows, SRC.cols))
    cells = []
    for r in range(SRC.rows):
        for c in range(SRC.cols):
            if (r, c) in {(2, 2), (4, 1)}:  # NoData holes
                continue
            cells.append((r, c, float(vals[r, c])))
    return cells


def _idw_expected(cells, shifts):
    grid = {(r, c): v for r, c, v in cells}
    out = {}
    for dr in range(DST.rows):
        for dc in range(DST.cols):
            x = DST.west + (dc + 0.5) * DST.res_x
            y = DST.north - (dr + 0.5) * DST.res_y
            rs = (SRC.north - y) / SRC.res_y
            cs = (x - SRC.west) / SRC.res_x
            orow, ocol = math.floor(rs), math.floor(cs)
            exact, num, den = None, 0.0, 0.0
            for dy, dx in shifts:
                v = grid.get((orow + dy, ocol + dx))
                if v is None:
                    continue
                ddy = (orow + dy) - rs
                ddx = (ocol + dx) - cs
                d2 = ddx * ddx + ddy * ddy
                if d2 == 0.0:
                    exact = v
                else:
                    num += v / d2
                    den += 1.0 / d2
            if exact is not None:
                out[(dr, dc)] = exact
            elif den > 0.0:
                out[(dr, dc)] = num / den
    return out


@pytest.mark.parametrize("method,shifts", [
    ("bilinear", enhance._IDW_SHIFTS["bilinear"]),
    ("cc", enhance._IDW_SHIFTS["cc"]),
])
def test_resample_idw_matches_numpy(spark, method, shifts):
    cells = _src_cells()
    src = local_df(spark, cells, columns=["row", "col", "value"])
    got = {
        (r["row"], r["col"]): r["value"]
        for r in enhance.resample_idw(src, SRC, DST, method).collect()
    }
    want = _idw_expected(cells, shifts)
    assert len(got) == DST.rows * DST.cols  # every dst cell present
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-12), key
    for key, v in got.items():
        if key not in want:
            assert v is None, key


def test_resample_idw_exact_center_hit(spark):
    # the reference kernel places cell values at INTEGER fractional coords
    # (resample.rs:340-344), so an exact hit needs rs = cs = integral:
    # dst center (x, y) with x = c_src*res_x and y = north - r_src*res_y.
    dst = GridConfig(rows=3, cols=3, north=SRC.north + SRC.res_y / 2.0,
                     west=SRC.west - SRC.res_x / 2.0,
                     res_x=SRC.res_x, res_y=SRC.res_y)
    cells = _src_cells()
    src = local_df(spark, cells, columns=["row", "col", "value"])
    grid = {(r, c): v for r, c, v in cells}
    got = {
        (r["row"], r["col"]): r["value"]
        for r in enhance.resample_idw(src, SRC, dst, "bilinear").collect()
    }
    # dst cell (r, c) center lands exactly on src integer coord (r, c),
    # whose neighbourhood exact-hit is src cell (r, c)'s value
    for (r, c), v in got.items():
        if (r, c) in grid:
            assert v == pytest.approx(grid[(r, c)], rel=1e-12), (r, c)


def test_mosaic_resample_first_input_wins(spark):
    a = local_df(spark, [(0, 0, 1.0)], columns=["row", "col", "value"])
    b = local_df(spark, [(0, 0, 2.0), (0, 1, 3.0)], columns=["row", "col", "value"])
    dst = GridConfig(rows=1, cols=2, north=SRC.north, west=SRC.west,
                     res_x=SRC.res_x, res_y=SRC.res_y)
    got = {
        (r["row"], r["col"]): r["value"]
        for r in enhance.mosaic_resample([(a, SRC), (b, SRC)], dst, "nn").collect()
    }
    assert got[(0, 0)] == 1.0  # first input wins
    assert got[(0, 1)] == 3.0  # fallback to second
