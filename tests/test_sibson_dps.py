"""SibsonInterpolation (discrete) + DrainagePreservingSmoothing: engine
vs direct numpy transcriptions of the same relational definitions
(operators/sibson.py, operators/dps.py) on small deterministic grids."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.dps import drainage_preserving_smoothing
from whitebox_tools_spark.operators.fps import FDX, FDY
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.operators.sibson import sibson_grid

CFG = GridConfig(rows=10, cols=12, north=100.0, west=0.0, res_x=10.0, res_y=10.0)


def _cells_np(cfg):
    rows = np.arange(cfg.rows)
    cols = np.arange(cfg.cols)
    cc, rr = np.meshgrid(cols, rows)
    x = cfg.west + (cc + 0.5) * cfg.res_x
    y = cfg.north - (rr + 0.5) * cfg.res_y
    return rr, cc, x, y


def _sibson_np(pts, cfg, radius):
    """pts: list of (pid, x, y, z)."""
    rr, cc, x, y = _cells_np(cfg)
    nn_d2 = np.full((cfg.rows, cfg.cols), np.nan)
    nn_owner = np.full((cfg.rows, cfg.cols), -1, dtype=np.int64)
    nn_z = np.full((cfg.rows, cfg.cols), np.nan)
    for pid, px, py, pz in pts:
        d2 = (x - px) ** 2 + (y - py) ** 2
        within = d2 <= radius * radius
        better = within & (
            np.isnan(nn_d2)
            | (d2 < nn_d2)
            | ((d2 == nn_d2) & (pid < nn_owner))
        )
        nn_d2[better] = d2[better]
        nn_owner[better] = pid
        nn_z[better] = pz

    wsum = np.zeros((cfg.rows, cfg.cols))
    wz = np.zeros((cfg.rows, cfg.cols))
    for pr in range(cfg.rows):
        for pc in range(cfg.cols):
            d2 = nn_d2[pr, pc]
            if np.isnan(d2) or d2 <= 0.0:
                continue
            for qr in range(cfg.rows):
                for qc in range(cfg.cols):
                    ld = ((qr - pr) * cfg.res_y) ** 2 + ((qc - pc) * cfg.res_x) ** 2
                    if ld < d2:
                        wsum[qr, qc] += 1
                        wz[qr, qc] += nn_z[pr, pc]
    out = np.where(wsum > 0, wz / np.maximum(wsum, 1), np.nan)
    exact = ~np.isnan(nn_d2) & (nn_d2 == 0.0)
    out[exact] = nn_z[exact]
    return out


def test_sibson_matches_numpy(spark):
    rng = np.random.RandomState(7)
    pts = [
        (int(i), float(rng.uniform(0, CFG.east)), float(rng.uniform(CFG.south, CFG.north)),
         float(rng.uniform(0, 50)))
        for i in range(25)
    ]
    # one sample exactly on a cell center exercises the d_nn = 0 branch
    pts.append((99, CFG.west + 2.5 * CFG.res_x, CFG.north - 3.5 * CFG.res_y, 42.0))
    df = spark.createDataFrame(pts, "doc_id long, x double, y double, z double")
    got = {
        (r["row"], r["col"]): r["value"]
        for r in sibson_grid(df, CFG, radius=60.0).collect()
    }
    want = _sibson_np(pts, CFG, 60.0)
    for r in range(CFG.rows):
        for c in range(CFG.cols):
            w = want[r, c]
            g = got[(r, c)]
            if np.isnan(w):
                assert g is None, (r, c)
            else:
                assert g == pytest.approx(w, rel=1e-9), (r, c)


XS = [-CFG.res_x, -CFG.res_x, -CFG.res_x, 0.0, CFG.res_x, CFG.res_x, CFG.res_x, 0.0]
YS = [-CFG.res_y, 0.0, CFG.res_y, CFG.res_y, CFG.res_y, 0.0, -CFG.res_y, -CFG.res_y]


def _dps_np(z, cfg, fs, norm_diff, num_iter, max_diff, reduction, dfm_threshold):
    rows, cols = z.shape
    reduction = min(max(reduction, 1.0), 99.0) / 100.0
    dfm_t = -abs(dfm_threshold)
    c = 8.0 * cfg.res_x
    base = math.cos(math.radians(norm_diff))
    reduced = math.cos(math.radians(norm_diff * (1.0 - reduction)))

    minbin = math.floor(z.min() * 1000.0)
    bo = np.floor(z * 1000.0).astype(np.int64) - minbin
    dfm = np.zeros_like(z)
    for r in range(rows):
        for cx in range(cols):
            vals = [
                bo[rr, cc]
                for rr in range(r - fs, r + fs + 1)
                for cc in range(cx - fs, cx + fs + 1)
                if 0 <= rr < rows and 0 <= cc < cols
            ]
            vals.sort()
            target = len(vals) // 2
            med = vals[target - 1] if target >= 1 else 0
            dfm[r, cx] = (bo[r, cx] - med) / 1000.0

    thr = np.where(
        (dfm < 0.0) & (dfm > dfm_t),
        np.cos(np.radians(norm_diff * (1.0 - reduction * dfm / dfm_t))),
        np.where(dfm <= dfm_t, reduced, base),
    )

    def at(arr, r, cx):
        if 0 <= r < rows and 0 <= cx < cols:
            return arr[r, cx]
        return None

    a = np.zeros_like(z)
    b = np.zeros_like(z)
    for r in range(rows):
        for cx in range(cols):
            v = []
            for i in range(8):
                zn = at(z, r + FDY[i], cx + FDX[i])
                v.append(z[r, cx] if zn is None else zn)
            a[r, cx] = -(v[2] - v[4] + 2.0 * (v[1] - v[5]) + v[0] - v[6])
            b[r, cx] = -(v[6] - v[4] + 2.0 * (v[7] - v[3]) + v[0] - v[2])

    def cosang(aa, ab, ba, bb):
        c2 = c * c
        return (aa * ba + ab * bb + c2) / math.sqrt(
            (aa * aa + ab * ab + c2) * (ba * ba + bb * bb + c2)
        )

    mid = fs // 2
    sa = np.zeros_like(z)
    sb = np.zeros_like(z)
    for r in range(rows):
        for cx in range(cols):
            t = thr[r, cx]
            sw = swa = swb = 0.0
            for rr in range(r - mid, r + mid + 1):
                for cc in range(cx - mid, cx + mid + 1):
                    if not (0 <= rr < rows and 0 <= cc < cols):
                        continue
                    ca = cosang(a[r, cx], b[r, cx], a[rr, cc], b[rr, cc])
                    if ca > t:
                        w = (ca - t) * (ca - t)
                        sw += w
                        swa += a[rr, cc] * w
                        swb += b[rr, cc] * w
            sa[r, cx] = swa / sw
            sb[r, cx] = swb / sw

    cur = z.copy()
    for _ in range(num_iter):
        nxt = z.copy()
        for r in range(rows):
            for cx in range(cols):
                t = thr[r, cx]
                sw = num = 0.0
                for i in range(8):
                    rr, cc = r + FDY[i], cx + FDX[i]
                    if not (0 <= rr < rows and 0 <= cc < cols):
                        continue
                    ca = cosang(sa[r, cx], sb[r, cx], sa[rr, cc], sb[rr, cc])
                    if ca > t:
                        w = (ca - t) * (ca - t)
                        sw += w
                        num += -(sa[rr, cc] * XS[i] + sb[rr, cc] * YS[i] - c * cur[rr, cc]) / c * w
                if sw > 0.0 and abs(num / sw - z[r, cx]) <= max_diff:
                    nxt[r, cx] = num / sw
                else:
                    nxt[r, cx] = z[r, cx]
        cur = nxt
    return cur


def test_dps_matches_numpy(spark):
    rng = np.random.RandomState(11)
    z = np.round(rng.uniform(0.0, 8.0, size=(CFG.rows, CFG.cols)), 3)
    # carve a drainage line so the DFM branch fires
    z[:, 5] -= 3.0
    rowsdf = [
        (int(r), int(c), float(z[r, c]))
        for r in range(CFG.rows)
        for c in range(CFG.cols)
    ]
    df = spark.createDataFrame(rowsdf, "row long, col long, value double")
    out = drainage_preserving_smoothing(
        df, CFG, filter_size=3, norm_diff=15.0, num_iter=2,
        max_diff=1.0, reduction=80.0, dfm_threshold=0.15,
    )
    got = {(r["row"], r["col"]): r["value"] for r in out.collect()}
    want = _dps_np(z, CFG, 3, 15.0, 2, 1.0, 80.0, 0.15)
    for r in range(CFG.rows):
        for c in range(CFG.cols):
            assert got[(r, c)] == pytest.approx(want[r, c], rel=1e-8, abs=1e-9), (r, c)
