"""Query catalog: second filter batch (gaussian-kernel family, fixed-mask
derivatives, value-conditional smoothing, integral image).

Kernel weights are computed once in Python and embedded verbatim (repr)
in both the Spark stencils and the DuckDB VALUES tables, so the float
constants are bit-identical; outputs are rounded to 6 dp on both sides
(SQL aggregates sum in arbitrary order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE, _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.operators import filters2 as f2
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.sources.tables import documents

TILE_SIZE = 8
G_SIGMA = 0.75
LOG_SIGMA = 1.0
DOG_S1, DOG_S2 = 1.0, 1.5
UNSHARP = dict(sigma=0.75, amount=50.0, threshold=0.0)
LAP_VARIANT = "3x3(1)"
LINE_VARIANT = "v"
ADAPT = dict(filter_x=5, filter_y=5, threshold=0.5)
BILAT = dict(sigma_dist=0.75, sigma_int=25.0)
EPM_T = 15.0
KNN = dict(filter_x=5, filter_y=5, k=5)
LEE = dict(filter_x=5, filter_y=5, sigma=20.0, m=5.0)


def _geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def _z(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _aliased(df: DataFrame, round6: bool = True) -> DataFrame:
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


QUERIES = {
    "gaussian_filter": lambda s, d: _aliased(
        f2.gaussian_filter(_z(s, d), GRID, G_SIGMA, tile_size=TILE_SIZE)),
    "log_filter": lambda s, d: _aliased(
        f2.log_filter(_z(s, d), GRID, LOG_SIGMA, tile_size=TILE_SIZE)),
    "dog_filter": lambda s, d: _aliased(
        f2.dog_filter(_z(s, d), GRID, DOG_S1, DOG_S2, tile_size=TILE_SIZE)),
    "unsharp_masking": lambda s, d: _aliased(
        f2.unsharp_masking(_z(s, d), GRID, tile_size=TILE_SIZE, **UNSHARP)),
    "laplacian_filter": lambda s, d: _aliased(
        f2.laplacian_filter(_z(s, d), GRID, LAP_VARIANT, tile_size=TILE_SIZE)),
    "line_detection": lambda s, d: _aliased(
        f2.line_detection_filter(_z(s, d), GRID, LINE_VARIANT, tile_size=TILE_SIZE)),
    "roberts_filter": lambda s, d: _aliased(
        f2.roberts_filter(_z(s, d), GRID, tile_size=TILE_SIZE)),
    "conservative_smoothing": lambda s, d: _aliased(
        f2.conservative_smoothing_filter(_z(s, d), GRID, 3, 3, tile_size=TILE_SIZE)),
    "adaptive_filter": lambda s, d: _aliased(
        f2.adaptive_filter(_z(s, d), GRID, tile_size=TILE_SIZE, **ADAPT)),
    "bilateral_filter": lambda s, d: _aliased(
        f2.bilateral_filter(_z(s, d), GRID, tile_size=TILE_SIZE, **BILAT)),
    "edge_preserving_mean": lambda s, d: _aliased(
        f2.edge_preserving_mean_filter(_z(s, d), GRID, 3, 3, EPM_T, tile_size=TILE_SIZE)),
    "k_nearest_mean": lambda s, d: _aliased(
        f2.k_nearest_mean_filter(_z(s, d), GRID, tile_size=TILE_SIZE, **KNN)),
    "lee_filter": lambda s, d: _aliased(
        f2.lee_filter(_z(s, d), GRID, tile_size=TILE_SIZE, **LEE)),
    "highpass_median": lambda s, d: _aliased(
        f2.highpass_median_filter(_z(s, d), GRID, 3, 3, tile_size=TILE_SIZE)),
    "integral_image": lambda s, d: _aliased(f2.integral_image(_z(s, d), GRID)),
}


# ------------------------------------------------------------- oracle SQL


def _vals(oww) -> str:
    return ", ".join(f"({dx}, {dy}, {w!r})" for dx, dy, w in oww)


def _norm_kernel_sql(oww) -> str:
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT * FROM (VALUES {_vals(oww)}) o(dc, dr, w))
SELECT c.cell_row, c.cell_col,
       round(sum(o.w * n.value) / sum(o.w), 6) AS value
FROM r c CROSS JOIN offs o
JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
GROUP BY c.cell_row, c.cell_col"""


def _dog_sql() -> str:
    o1, o2 = f2.gaussian_offsets_weights(DOG_S1), f2.gaussian_offsets_weights(DOG_S2)
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
o1 AS (SELECT * FROM (VALUES {_vals(o1)}) o(dc, dr, w)),
o2 AS (SELECT * FROM (VALUES {_vals(o2)}) o(dc, dr, w)),
b1 AS (SELECT c.cell_row, c.cell_col, sum(o.w * n.value) / sum(o.w) AS b
       FROM r c CROSS JOIN o1 o
       JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
       GROUP BY c.cell_row, c.cell_col),
b2 AS (SELECT c.cell_row, c.cell_col, sum(o.w * n.value) / sum(o.w) AS b
       FROM r c CROSS JOIN o2 o
       JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
       GROUP BY c.cell_row, c.cell_col)
SELECT b1.cell_row, b1.cell_col, round(b1.b - b2.b, 6) AS value
FROM b1 JOIN b2 ON b1.cell_row = b2.cell_row AND b1.cell_col = b2.cell_col"""


def _unsharp_sql() -> str:
    oww = f2.gaussian_offsets_weights(UNSHARP["sigma"])
    amt = UNSHARP["amount"] / 100.0 + 1.0
    thr = abs(UNSHARP["threshold"])
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT * FROM (VALUES {_vals(oww)}) o(dc, dr, w)),
b AS (SELECT c.cell_row, c.cell_col, any_value(c.value) AS z,
             sum(o.w * n.value) / sum(o.w) AS blur
      FROM r c CROSS JOIN offs o
      JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col)
SELECT cell_row, cell_col,
       round(CASE WHEN z - blur > {thr!r} THEN z + (z - blur) * {amt!r}
                  ELSE z END, 6) AS value
FROM b"""


def _mask_sql(weights, size) -> str:
    mid = size // 2
    vals = ", ".join(
        f"({c - mid}, {r - mid}, {weights[r * size + c]!r})"
        for r in range(size) for c in range(size)
        if weights[r * size + c] != 0.0
    )
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT * FROM (VALUES {vals}) o(dc, dr, w))
SELECT c.cell_row, c.cell_col,
       round(sum(o.w * coalesce(n.value, c.value)), 6) AS value
FROM r c CROSS JOIN offs o
LEFT JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
GROUP BY c.cell_row, c.cell_col"""


_ROBERTS_SQL = f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE}
SELECT c.cell_row, c.cell_col,
       round(abs(c.value - coalesce(z4.value, c.value))
             + abs(coalesce(z2.value, c.value) - coalesce(z3.value, c.value)), 6) AS value
FROM r c
LEFT JOIN r z2 ON z2.cell_row = c.cell_row AND z2.cell_col = c.cell_col + 1
LEFT JOIN r z3 ON z3.cell_row = c.cell_row + 1 AND z3.cell_col = c.cell_col
LEFT JOIN r z4 ON z4.cell_row = c.cell_row + 1 AND z4.cell_col = c.cell_col + 1"""

_W3_CTE = """offs AS (SELECT a.i - 1 AS dr, b.i - 1 AS dc
        FROM range(0, 3) a(i), range(0, 3) b(i)),
w AS (SELECT c.cell_row, c.cell_col, c.value AS z, n.value AS nv,
             (o.dr + 1) * 3 + (o.dc + 1) AS idx
      FROM r c CROSS JOIN offs o
      JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc)"""


def _conservative_sql() -> str:
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_W3_CTE},
s2 AS (SELECT w.cell_row, w.cell_col, any_value(w.z) AS z,
              any_value(s.mn) AS mn, any_value(s.mx) AS mx,
              count(*) FILTER (w.nv = s.mn) AS cnt_mn,
              count(*) FILTER (w.nv = s.mx) AS cnt_mx,
              min(w.nv) FILTER (w.nv > s.mn) AS mn2,
              max(w.nv) FILTER (w.nv < s.mx) AS mx2
       FROM w JOIN (SELECT cell_row, cell_col, min(nv) AS mn, max(nv) AS mx
                    FROM w GROUP BY cell_row, cell_col) s
         ON s.cell_row = w.cell_row AND s.cell_col = w.cell_col
       GROUP BY w.cell_row, w.cell_col)
SELECT cell_row, cell_col,
       round(CASE WHEN z > mn AND z < mx THEN z
                  WHEN z = mn THEN CASE WHEN cnt_mn >= 2 THEN mn
                                        ELSE coalesce(mn2, mn) END
                  ELSE CASE WHEN cnt_mx >= 2 THEN mx
                            ELSE coalesce(mx2, mx) END END, 6) AS value
FROM s2"""


def _adaptive_sql() -> str:
    mid = ADAPT["filter_x"] // 2
    thr = ADAPT["threshold"]
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
mn AS (SELECT min(value) AS m FROM r),
offs AS (SELECT a.i - {mid} AS dr, b.i - {mid} AS dc
         FROM range(0, {2 * mid + 1}) a(i), range(0, {2 * mid + 1}) b(i)),
j AS (SELECT c.cell_row, c.cell_col, any_value(c.value) AS z, any_value(mn.m) AS m,
             sum(n.value - mn.m) AS s, sum((n.value - mn.m) * (n.value - mn.m)) AS s2,
             count(*) AS cnt
      FROM r c CROSS JOIN mn CROSS JOIN offs o
      JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
      WHERE c.cell_row + o.dr >= 1 AND c.cell_col + o.dc >= 1
      GROUP BY c.cell_row, c.cell_col),
v AS (SELECT cell_row, cell_col, z, m, s / cnt + m AS mean,
             (s2 - (s * s) / cnt) / cnt AS var FROM j)
SELECT cell_row, cell_col,
       round(CASE WHEN var > 0.0 AND (z - mean) / sqrt(var) > {thr!r}
                  THEN mean ELSE z END, 6) AS value
FROM v"""


def _bilateral_sql() -> str:
    import math
    oww = f2.gaussian_offsets_weights(BILAT["sigma_dist"])
    recip_i = 1.0 / (math.sqrt(2.0 * math.pi) * BILAT["sigma_int"])
    tss = 2.0 * BILAT["sigma_int"] ** 2
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT * FROM (VALUES {_vals(oww)}) o(dc, dr, w))
SELECT c.cell_row, c.cell_col,
       round(sum(o.w * {recip_i!r} * exp(-1.0 * ((n.value - c.value) * (n.value - c.value)) / {tss!r}) * n.value)
             / sum(o.w * {recip_i!r} * exp(-1.0 * ((n.value - c.value) * (n.value - c.value)) / {tss!r})), 6) AS value
FROM r c CROSS JOIN offs o
JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
GROUP BY c.cell_row, c.cell_col"""


def _epm_sql() -> str:
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_W3_CTE}
SELECT cell_row, cell_col,
       round(sum(nv) FILTER (abs(nv - z) <= {EPM_T!r})
             / count(*) FILTER (abs(nv - z) <= {EPM_T!r}), 6) AS value
FROM w GROUP BY cell_row, cell_col"""


def _knn_sql() -> str:
    mid = KNN["filter_x"] // 2
    k = KNN["k"]
    n = 2 * mid + 1
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT a.i - {mid} AS dr, b.i - {mid} AS dc
         FROM range(0, {n}) a(i), range(0, {n}) b(i)),
w AS (SELECT c.cell_row, c.cell_col, n.value AS nv,
             (n.value - c.value) * (n.value - c.value) AS d2,
             (o.dr + {mid}) * {n} + (o.dc + {mid}) AS idx
      FROM r c CROSS JOIN offs o
      JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc),
pick AS (SELECT cell_row, cell_col, nv FROM w
         QUALIFY row_number() OVER (PARTITION BY cell_row, cell_col
                                    ORDER BY d2, idx) <= {k})
SELECT cell_row, cell_col, round(avg(nv), 6) AS value
FROM pick GROUP BY cell_row, cell_col"""


def _lee_sql() -> str:
    mid = LEE["filter_x"] // 2
    n = 2 * mid + 1
    sig, m = LEE["sigma"], min(LEE["m"], float(LEE["filter_x"] * LEE["filter_y"]))
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT a.i - {mid} AS dr, b.i - {mid} AS dc
         FROM range(0, {n}) a(i), range(0, {n}) b(i)),
band AS (SELECT c.cell_row, c.cell_col,
                count(*) FILTER (n.value >= c.value - {sig!r}
                                 AND n.value <= c.value + {sig!r}) AS bn,
                sum(n.value) FILTER (n.value >= c.value - {sig!r}
                                     AND n.value <= c.value + {sig!r}) AS bs
         FROM r c CROSS JOIN offs o
         JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
         GROUP BY c.cell_row, c.cell_col),
ring AS (SELECT c.cell_row, c.cell_col, count(n.value) AS rn, sum(n.value) AS rs
         FROM r c CROSS JOIN (SELECT a.i - 1 AS dr, b.i - 1 AS dc
                              FROM range(0, 3) a(i), range(0, 3) b(i)
                              WHERE NOT (a.i = 1 AND b.i = 1)) o
         JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
         GROUP BY c.cell_row, c.cell_col)
SELECT b.cell_row, b.cell_col,
       round(CASE WHEN b.bn > {m!r} THEN b.bs / b.bn
                  ELSE r2.rs / r2.rn END, 6) AS value
FROM band b LEFT JOIN ring r2
  ON r2.cell_row = b.cell_row AND r2.cell_col = b.cell_col
WHERE b.bn > {m!r} OR coalesce(r2.rn, 0) > 0"""


def _hpmed_sql() -> str:
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_W3_CTE}
SELECT cell_row, cell_col, round(any_value(z) - median(nv), 6) AS value
FROM w GROUP BY cell_row, cell_col"""


def _integral_sql() -> str:
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
cells AS (SELECT CAST(a.i AS BIGINT) AS cell_row, CAST(b.i AS BIGINT) AS cell_col
          FROM range(0, {GRID.rows}) a(i), range(0, {GRID.cols}) b(i)),
d AS (SELECT c.cell_row, c.cell_col, coalesce(r.value, 0.0) AS v
      FROM cells c LEFT JOIN r ON r.cell_row = c.cell_row AND r.cell_col = c.cell_col),
rc AS (SELECT cell_row, cell_col,
              sum(v) OVER (PARTITION BY cell_row ORDER BY cell_col
                           ROWS UNBOUNDED PRECEDING) AS rcs
       FROM d)
SELECT cell_row, cell_col,
       round(sum(rcs) OVER (PARTITION BY cell_col ORDER BY cell_row
                            ROWS UNBOUNDED PRECEDING), 6) AS value
FROM rc"""


ORACLE_SQL = {
    "gaussian_filter": _norm_kernel_sql(f2.gaussian_offsets_weights(G_SIGMA)),
    "log_filter": _norm_kernel_sql(f2.log_offsets_weights(LOG_SIGMA)),
    "dog_filter": _dog_sql(),
    "unsharp_masking": _unsharp_sql(),
    "laplacian_filter": _mask_sql(*f2.LAPLACIAN_MASKS[LAP_VARIANT]),
    "line_detection": _mask_sql(f2.LINE_DETECTION_MASKS[LINE_VARIANT], 3),
    "roberts_filter": _ROBERTS_SQL,
    "conservative_smoothing": _conservative_sql(),
    "adaptive_filter": _adaptive_sql(),
    "bilateral_filter": _bilateral_sql(),
    "edge_preserving_mean": _epm_sql(),
    "k_nearest_mean": _knn_sql(),
    "lee_filter": _lee_sql(),
    "highpass_median": _hpmed_sql(),
    "integral_image": _integral_sql(),
}
