"""BoundaryShapeComplexity: the engine's relational walk model vs a
direct sequential transcription of the reference scan
(boundary_shape_complexity.rs:395-520) on random polygon rasters."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.bsc import boundary_shape_complexity
from whitebox_tools_spark.operators.gridding import GridConfig

DX = [1, 1, 1, 0, -1, -1, -1, 0]
DY = [-1, 0, 1, 1, 1, 0, -1, -1]

ELEMENTS1 = [[6, 7, 0, 4, 3, 2], [0, 1, 2, 4, 5, 6], [2, 3, 4, 6, 7, 0], [4, 5, 6, 0, 1, 2]]
ELEMENTS2 = [[7, 0, 1, 3, 5], [1, 2, 3, 5, 7], [3, 4, 5, 7, 1], [5, 6, 7, 1, 3]]
VALS1 = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]
VALS2 = [0.0, 0.0, 0.0, 1.0, 1.0]


def _thin_sync(mask: np.ndarray, rounds: int) -> np.ndarray:
    """The engine's synchronous Jacobi thinning (operators/morpho.py):
    each directional pass reads the previous pass's raster."""
    out = mask.astype(float).copy()
    rows, cols = out.shape

    def nb(arr, r, c, i):
        rr, cc = r + DY[i], c + DX[i]
        if 0 <= rr < rows and 0 <= cc < cols:
            return arr[rr, cc]
        return math.nan  # out of grid: matches no pattern value

    for _ in range(rounds):
        changed = False
        for a in range(4):
            prev = out.copy()
            for r in range(rows):
                for c in range(cols):
                    if prev[r, c] > 0.0:
                        m1 = all(
                            nb(prev, r, c, e) == v
                            for e, v in zip(ELEMENTS1[a], VALS1)
                        )
                        m2 = all(
                            nb(prev, r, c, e) == v
                            for e, v in zip(ELEMENTS2[a], VALS2)
                        )
                        if m1 or m2:
                            out[r, c] = 0.0
                            changed = True
        if not changed:
            break
    return out


def _bsc_reference(poly: np.ndarray, rounds: int) -> np.ndarray:
    """Sequential transcription of the reference's index scan, run on
    the engine's skeleton."""
    rows, cols = poly.shape
    skel = _thin_sync((poly > 0).astype(float), rounds)
    visited = np.zeros_like(poly, dtype=int)
    minv = poly.min()
    nbins = int(math.ceil(poly.max() - minv + 0.00001))
    num_cells = np.zeros(nbins)
    num_end = np.zeros(nbins)
    longest = np.zeros(nbins, dtype=int)
    second = np.zeros(nbins, dtype=int)

    def deg_nbrs(r, c, pid):
        out = []
        for a in range(8):
            rr, cc = r + DY[a], c + DX[a]
            if 0 <= rr < rows and 0 <= cc < cols:
                if skel[rr, cc] == 1.0 and poly[rr, cc] == pid:
                    out.append(a)
        return out

    for row in range(rows):
        for col in range(cols):
            if skel[row, col] > 0:
                pid = poly[row, col]
                b = int(math.floor(pid - minv))
                num_cells[b] += 1
                if len(deg_nbrs(row, col, pid)) == 1:
                    num_end[b] += 1
                    rn, cn = row, col
                    link = 1
                    while True:
                        visited[rn, cn] = 1
                        nbrs = deg_nbrs(rn, cn, pid)
                        nxt = None
                        for a in nbrs:
                            if visited[rn + DY[a], cn + DX[a]] == 0:
                                nxt = a
                        if len(nbrs) < 3 and nxt is not None:
                            link += 1
                            rn += DY[nxt]
                            cn += DX[nxt]
                        else:
                            break
                    num_end[b] += link
                    if longest[b] < link:
                        second[b] = longest[b]
                        longest[b] = link
                    elif second[b] < link:
                        second[b] = link
    for b in range(1, nbins):
        num_end[b] = (
            100.0 * (num_end[b] - longest[b] - second[b]) / num_cells[b]
            if num_cells[b]
            else math.nan
        )
    out = np.zeros_like(poly, dtype=float)
    for r in range(rows):
        for c in range(cols):
            if poly[r, c] != 0:
                out[r, c] = num_end[int(math.floor(poly[r, c] - minv))]
    return out


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_bsc_matches_sequential_reference(spark, seed):
    rng = np.random.RandomState(seed)
    rows = cols = 18
    poly = np.zeros((rows, cols))
    # a few random blobs with ids 1..4
    for pid in range(1, 5):
        r0, c0 = rng.randint(2, rows - 6, 2)
        h, w = rng.randint(3, 7, 2)
        poly[r0 : r0 + h, c0 : c0 + w] = pid
    cfg = GridConfig(rows=rows, cols=cols, north=100.0, west=0.0, res_x=1.0, res_y=1.0)
    pdf = [
        (int(r), int(c), float(poly[r, c])) for r in range(rows) for c in range(cols)
    ]
    df = spark.createDataFrame(pdf, "row long, col long, value double")
    got = {
        (r["row"], r["col"]): r["value"]
        for r in boundary_shape_complexity(df, cfg, tile_size=8, thin_rounds=12).collect()
    }
    exp = _bsc_reference(poly, 12)
    for r in range(rows):
        for c in range(cols):
            g, e = got[(r, c)], exp[r, c]
            if math.isnan(e):
                assert math.isnan(g), (r, c, g, e)
            else:
                assert abs(g - e) < 1e-9, (r, c, g, e, poly[r, c])
