"""Query catalog: oracle coverage for the remaining engine-status tools —
gradient/mask filter variants, image flips, NDI, raster stats, point
thinning, inflow counts, stack profiles, raster clip/erase, contrast
stretches, vector centroid/medoid, symmetrical-difference measures.

Each entry upgrades a `engine` (pytest-only) registry row to an
oracle-verified one; the DuckDB SQL transcribes the identical reference
semantics over the same fixtures.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import (
    GRID, _COL_SQL, _IN_GRID_SQL, _PTS_CTE, _ROW_SQL,
)
from whitebox_tools_spark.catalog_focal import (
    TILE_SIZE, _PTS_RASTER_LAST_CTE, _nbr_joins, _raster,
)
from whitebox_tools_spark.localrel import local_df
from whitebox_tools_spark.operators import filters as flt
from whitebox_tools_spark.operators import local_math as lm
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators import zonal
from whitebox_tools_spark.sources import vectors
from whitebox_tools_spark.sources.tables import documents

HIST_BINS, HIST_LO, HIST_HI = 8, 0.0, 1000.0
THIN_RES = 100.0
THIN_MAX = 3
UW_WEIGHTS = (0.5, -1.0, 0.25, 2.0, 1.0, -0.75, 0.0, 1.5, -0.5)  # user-defined
STRETCH_LO_PCT, STRETCH_HI_PCT = 0.05, 0.95
STRETCH_K = 1.5
PROFILE_MOD = 41


def _zfirst(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_first(spark, sf_dir)


def _aliased(df: DataFrame, round6: bool = True) -> DataFrame:
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


def _geo(spark, sf_dir):
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


# ------------------------------------------------- gradient/mask filters


def q_prewitt(spark, sf_dir):
    return _aliased(flt.gradient_filter(_raster(spark, sf_dir), GRID, "prewitt", TILE_SIZE))


def q_scharr(spark, sf_dir):
    return _aliased(flt.gradient_filter(_raster(spark, sf_dir), GRID, "scharr", TILE_SIZE))


def q_emboss(spark, sf_dir):
    return _aliased(
        flt.emboss_filter(_raster(spark, sf_dir), GRID, "n", TILE_SIZE), round6=False
    )


def q_user_weights(spark, sf_dir):
    return _aliased(
        flt.mask_filter(_raster(spark, sf_dir), GRID, UW_WEIGHTS, tile_size=TILE_SIZE)
    )


def _oracle_gradient(variant: str) -> str:
    joins, nbrs = _nbr_joins()
    mx, my = flt.GRADIENT_MASKS[variant]
    sx = " + ".join(f"n{i} * {mx[i]!r}" for i in range(8) if mx[i] != 0.0)
    sy = " + ".join(f"n{i} * {my[i]!r}" for i in range(8) if my[i] != 0.0)
    return f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
nb AS (SELECT c.cell_row, c.cell_col, {nbrs} FROM r c {joins}),
g AS (SELECT cell_row, cell_col, ({sx}) AS sx, ({sy}) AS sy FROM nb)
SELECT cell_row, cell_col, round(sqrt(sx * sx + sy * sy), 6) AS value FROM g
"""


def _mask_nbr_joins():
    # mask-filter offsets (flt._M_DX / _M_DY 3x3 row-major order)
    joins, nbrs = [], []
    for k, (dx, dy) in enumerate(zip(flt._M_DX, flt._M_DY)):
        joins.append(
            f"LEFT JOIN r m{k} ON m{k}.cell_row = c.cell_row + ({dy}) "
            f"AND m{k}.cell_col = c.cell_col + ({dx})"
        )
        nbrs.append(f"coalesce(m{k}.value, c.value) AS m{k}")
    return " ".join(joins), ", ".join(nbrs)


def _oracle_mask(weights, round6: bool) -> str:
    joins, nbrs = _mask_nbr_joins()
    s = " + ".join(f"m{i} * {float(w)!r}" for i, w in enumerate(weights) if w != 0)
    out = f"round(({s}), 6)" if round6 else f"({s})"
    return f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
nb AS (SELECT c.cell_row, c.cell_col, {nbrs} FROM r c {joins})
SELECT cell_row, cell_col, {out} AS value FROM nb
"""


# -------------------------------------------------------- flips and NDI


def q_flip_image(spark, sf_dir):
    out = rop.flip_image(_raster(spark, sf_dir), GRID, "vertical")
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


def q_ndi(spark, sf_dir):
    a, b = _raster(spark, sf_dir), _zfirst(spark, sf_dir)
    num = lm.binary(a, b, "subtract")
    den = lm.binary(a, b, "add")
    out = lm.binary(num, den, "divide")
    return _aliased(out)


# ------------------------------------------------------- raster reports


def q_raster_summary(spark, sf_dir):
    out = zonal.raster_summary_stats(_raster(spark, sf_dir))
    return out.select(
        "n", F.round("total", 6).alias("total"), F.round("mean", 6).alias("mean"),
        "min_v", "max_v", F.round("stddev", 6).alias("stddev"),
    )


def q_raster_histogram(spark, sf_dir):
    return zonal.raster_histogram(_raster(spark, sf_dir), HIST_BINS, HIST_LO, HIST_HI)


# ------------------------------------------------------- point thinning


def q_lidar_thin(spark, sf_dir):
    from whitebox_tools_spark.operators.cells import thin_points
    return thin_points(_geo(spark, sf_dir), THIN_RES, "doc_id", 1).select("doc_id")


def q_lidar_thin_high_density(spark, sf_dir):
    from whitebox_tools_spark.operators.cells import thin_points
    return thin_points(_geo(spark, sf_dir), THIN_RES, "doc_id", THIN_MAX).select("doc_id")


# --------------------------------------------------- inflow neighbour count


def q_num_inflowing(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY

    dirs = _cc.dirs(spark, sf_dir)
    dx = F.array(*[F.lit(v) for v in D8_DX])
    dy = F.array(*[F.lit(v) for v in D8_DY])
    down = dirs.where(F.col("dir") >= 0).select(
        (F.col("row") + F.element_at(dy, F.col("dir") + 1)).alias("row"),
        (F.col("col") + F.element_at(dx, F.col("dir") + 1)).alias("col"),
    )
    cnt = down.groupBy("row", "col").agg(F.count(F.lit(1)).alias("n"))
    return (
        dirs.select("row", "col")
        .join(cnt, ["row", "col"], "left")
        .select(
            F.col("row").alias("cell_row"),
            F.col("col").alias("cell_col"),
            F.coalesce("n", F.lit(0)).cast("double").alias("value"),
        )
    )


# ------------------------------------------------------- stack profile


def q_image_stack_profile(spark, sf_dir):
    pts = _geo(spark, sf_dir).where(F.pmod("doc_id", F.lit(PROFILE_MOD)) == 0)
    return rop.image_stack_profile(
        pts, [_raster(spark, sf_dir), _zfirst(spark, sf_dir)], GRID, "doc_id"
    )


# --------------------------------------------------- raster clip / erase


def q_clip_raster(spark, sf_dir):
    from whitebox_tools_spark.operators.raster import clip_raster_to_polygon

    out = clip_raster_to_polygon(
        _raster(spark, sf_dir), vectors.rect_layer(), GRID, erase=False
    )
    return _aliased(out.where(F.col("value").isNotNull()), round6=False)


def q_erase_raster(spark, sf_dir):
    from whitebox_tools_spark.operators.raster import clip_raster_to_polygon

    out = clip_raster_to_polygon(
        _raster(spark, sf_dir), vectors.rect_layer(), GRID, erase=True
    )
    return _aliased(out.where(F.col("value").isNotNull()), round6=False)


# ------------------------------------------------------ contrast stretches


def q_stddev_stretch(spark, sf_dir):
    r = _raster(spark, sf_dir)
    st = r.agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    j = r.crossJoin(F.broadcast(st))
    lo = F.col("mu") - STRETCH_K * F.col("sd")
    hi = F.col("mu") + STRETCH_K * F.col("sd")
    out = (
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), (F.col("value") - lo) / (hi - lo)))
        * 255.0
    )
    return j.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round(out, 6).alias("value"),
    )


def q_percentage_stretch(spark, sf_dir):
    r = _raster(spark, sf_dir)
    st = r.agg(
        F.expr(f"percentile(value, {STRETCH_LO_PCT!r})").alias("lo"),
        F.expr(f"percentile(value, {STRETCH_HI_PCT!r})").alias("hi"),
    )
    j = r.crossJoin(F.broadcast(st))
    out = (
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(1.0), (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))),
        )
        * 255.0
    )
    return j.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round(out, 6).alias("value"),
    )


# ---------------------------------------------- centroid / medoid / symdiff


def _vertex_rows(spark):
    rows = []
    for r in vectors.layer_to_rows(vectors.rect_layer()):
        if r["is_hole"]:
            continue
        for x, y in zip(r["xs"], r["ys"]):
            rows.append(dict(fid=r["fid"], x=float(x), y=float(y)))
    return local_df(spark, rows)


def q_centroid_vector(spark, sf_dir):
    from whitebox_tools_spark.operators.measures import centroid_vector

    out = centroid_vector(_vertex_rows(spark), record="fid")
    return out.select("fid", F.round("x", 6).alias("x"), F.round("y", 6).alias("y"))


def q_medoid(spark, sf_dir):
    pts = _vertex_rows(spark)
    cen = pts.groupBy("fid").agg(F.avg("x").alias("cx"), F.avg("y").alias("cy"))
    d2 = (F.col("x") - F.col("cx")) ** 2 + (F.col("y") - F.col("cy")) ** 2
    w = Window.partitionBy("fid").orderBy(
        d2.asc(), F.col("x").asc(), F.col("y").asc()
    )
    return (
        pts.join(cen, "fid")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("fid", "x", "y")
    )


def q_symmetrical_difference_area(spark, sf_dir):
    from whitebox_tools_spark.catalog_overlay import _layer_a, _layer_b
    from whitebox_tools_spark.operators.vector_ops import overlay_measures

    ab = overlay_measures(_layer_a(spark), _layer_b(spark))
    ba = overlay_measures(_layer_b(spark), _layer_a(spark))
    ea = ab.agg(F.sum("erase_area").alias("s")).select(F.col("s").alias("ea"))
    eb = ba.agg(F.sum("erase_area").alias("s")).select(F.col("s").alias("eb"))
    return ea.crossJoin(eb).select(
        F.round(F.col("ea") + F.col("eb"), 6).alias("sym_area")
    )


QUERIES = {
    "prewitt": q_prewitt,
    "scharr": q_scharr,
    "emboss": q_emboss,
    "user_weights_filter": q_user_weights,
    "flip_image": q_flip_image,
    "ndi": q_ndi,
    "raster_summary": q_raster_summary,
    "raster_histogram": q_raster_histogram,
    "lidar_thin": q_lidar_thin,
    "lidar_thin_high_density": q_lidar_thin_high_density,
    "num_inflowing": q_num_inflowing,
    "image_stack_profile": q_image_stack_profile,
    "clip_raster": q_clip_raster,
    "erase_raster": q_erase_raster,
    "stddev_stretch": q_stddev_stretch,
    "percentage_stretch": q_percentage_stretch,
    "centroid_vector": q_centroid_vector,
    "medoid": q_medoid,
    "symmetrical_difference_area": q_symmetrical_difference_area,
}


# ------------------------------------------------------------- oracle SQL


def _vertex_values_sql() -> str:
    rows = []
    for r in vectors.layer_to_rows(vectors.rect_layer()):
        if r["is_hole"]:
            continue
        for x, y in zip(r["xs"], r["ys"]):
            rows.append((r["fid"], float(x), float(y)))
    vals = ", ".join(f"({fid}, {x!r}, {y!r})" for fid, x, y in rows)
    return (
        f"verts AS (SELECT CAST(fid AS BIGINT) AS fid, CAST(x AS DOUBLE) AS x, "
        f"CAST(y AS DOUBLE) AS y FROM (VALUES {vals}) AS t(fid, x, y))"
    )


def _sym_diff_oracle() -> str:
    # closed-form axis-aligned rectangle algebra over the two fixture
    # layers (same independent form as catalog_overlay's measure oracles)
    def feat_rects(specs):
        out = []
        for fid, xmin, ymin, xmax, ymax, hole in specs:
            out.append((xmin, ymin, xmax, ymax, hole))
        return out

    def area(spec):
        # shells only — overlay_measures operates on ~is_hole parts
        xmin, ymin, xmax, ymax, _hole = spec
        return (xmax - xmin) * (ymax - ymin)

    def inter_rr(r1, r2):
        # shell-shell intersection (holes excluded, as in the engine)
        w = min(r1[2], r2[2]) - max(r1[0], r2[0])
        h = min(r1[3], r2[3]) - max(r1[1], r2[1])
        return max(w, 0.0) * max(h, 0.0)

    la = feat_rects(vectors.RECT_SPECS)
    lb = feat_rects(vectors.RECT_SPECS_B)
    inter = sum(inter_rr(a, b) for a in la for b in lb)
    sym = sum(area(a) for a in la) + sum(area(b) for b in lb) - 2.0 * inter
    return f"SELECT round(CAST({sym!r} AS DOUBLE), 6) AS sym_area"


ORACLE_SQL = {
    "prewitt": _oracle_gradient("prewitt"),
    "scharr": _oracle_gradient("scharr"),
    "emboss": _oracle_mask(flt.EMBOSS_WEIGHTS["n"], round6=False),
    "user_weights_filter": _oracle_mask(UW_WEIGHTS, round6=True),
    "flip_image": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE}
SELECT {GRID.rows - 1} - cell_row AS cell_row, cell_col, value FROM r
""",
    "ndi": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
rf AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col,
              arg_min(z, doc_id) AS value
       FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col)
SELECT a.cell_row, a.cell_col,
       round((a.value - b.value) / (a.value + b.value), 6) AS value
FROM r a JOIN rf b ON a.cell_row = b.cell_row AND a.cell_col = b.cell_col
""",
    "raster_summary": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE}
SELECT count(*) AS n, round(sum(value), 6) AS total, round(avg(value), 6) AS mean,
       min(value) AS min_v, max(value) AS max_v, round(stddev_samp(value), 6) AS stddev
FROM r
""",
    "raster_histogram": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE}
SELECT CAST(least({HIST_BINS - 1}, greatest(0,
         floor((value - {HIST_LO!r}) / {(HIST_HI - HIST_LO) / HIST_BINS!r}))) AS BIGINT) AS bin,
       count(*) AS n
FROM r GROUP BY bin
""",
    "lidar_thin": f"""
WITH {_PTS_CTE}
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (
    PARTITION BY CAST(floor(x / {THIN_RES!r}) AS BIGINT),
                 CAST(floor(y / {THIN_RES!r}) AS BIGINT)
    ORDER BY doc_id) AS rn
  FROM pts) t WHERE rn = 1
""",
    "lidar_thin_high_density": f"""
WITH {_PTS_CTE}
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (
    PARTITION BY CAST(floor(x / {THIN_RES!r}) AS BIGINT),
                 CAST(floor(y / {THIN_RES!r}) AS BIGINT)
    ORDER BY doc_id) AS rn
  FROM pts) t WHERE rn <= {THIN_MAX}
""",
    "centroid_vector": f"""
WITH {_vertex_values_sql()}
SELECT fid, round(avg(x), 6) AS x, round(avg(y), 6) AS y FROM verts GROUP BY fid
""",
    "medoid": f"""
WITH {_vertex_values_sql()},
cen AS (SELECT fid, avg(x) AS cx, avg(y) AS cy FROM verts GROUP BY fid)
SELECT fid, x, y FROM (
  SELECT v.fid, v.x, v.y, row_number() OVER (
    PARTITION BY v.fid
    ORDER BY (v.x - c.cx) * (v.x - c.cx) + (v.y - c.cy) * (v.y - c.cy) ASC,
             v.x ASC, v.y ASC) AS rn
  FROM verts v JOIN cen c ON c.fid = v.fid) t
WHERE rn = 1
""",
    "symmetrical_difference_area": _sym_diff_oracle(),
}


def _num_inflowing_sql() -> str:
    from whitebox_tools_spark.catalog_iter import _Z_CTE, _d8_dir_sql
    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY

    dxs = "[" + ",".join(str(v) for v in D8_DX) + "]"
    dys = "[" + ",".join(str(v) for v in D8_DY) + "]"
    return f"""
WITH {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
down AS (SELECT cell_row + {dys}[dir + 1] AS cell_row,
                cell_col + {dxs}[dir + 1] AS cell_col
         FROM dirs WHERE dir >= 0),
cnt AS (SELECT cell_row, cell_col, count(*) AS n FROM down GROUP BY 1, 2)
SELECT d.cell_row, d.cell_col,
       CAST(coalesce(c.n, 0) AS DOUBLE) AS value
FROM dirs d LEFT JOIN cnt c
  ON c.cell_row = d.cell_row AND c.cell_col = d.cell_col
"""


def _stack_profile_sql() -> str:
    return f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
rf AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col,
              arg_min(z, doc_id) AS value
       FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
p AS (SELECT doc_id, {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col
      FROM pts WHERE doc_id % {PROFILE_MOD} = 0 AND {_IN_GRID_SQL})
SELECT p.doc_id, 0 AS image, r.value AS z
FROM p LEFT JOIN r ON r.cell_row = p.cell_row AND r.cell_col = p.cell_col
UNION ALL
SELECT p.doc_id, 1 AS image, rf.value AS z
FROM p LEFT JOIN rf ON rf.cell_row = p.cell_row AND rf.cell_col = p.cell_col
"""


def _clip_raster_sql(erase: bool) -> str:
    xc = f"({GRID.west!r} + (CAST(cell_col AS DOUBLE) + 0.5) * {GRID.res_x!r})"
    yc = f"({GRID.north!r} - (CAST(cell_row AS DOUBLE) + 0.5) * {GRID.res_y!r})"
    pred = vectors.rect_layer_sql_predicate(xc, yc)
    keep = f"NOT {pred}" if erase else pred
    return f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE}
SELECT cell_row, cell_col, value FROM r WHERE {keep}
"""


ORACLE_SQL["num_inflowing"] = _num_inflowing_sql()
ORACLE_SQL["image_stack_profile"] = _stack_profile_sql()
ORACLE_SQL["clip_raster"] = _clip_raster_sql(erase=False)
ORACLE_SQL["erase_raster"] = _clip_raster_sql(erase=True)
ORACLE_SQL["stddev_stretch"] = f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
st AS (SELECT avg(value) AS mu, stddev_samp(value) AS sd FROM r)
SELECT cell_row, cell_col,
       round(greatest(0.0, least(1.0,
         (value - (mu - {STRETCH_K!r} * sd)) / ((mu + {STRETCH_K!r} * sd) - (mu - {STRETCH_K!r} * sd))
       )) * 255.0, 6) AS value
FROM r, st
"""
ORACLE_SQL["percentage_stretch"] = f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
st AS (SELECT quantile_cont(value, {STRETCH_LO_PCT!r}) AS lo,
              quantile_cont(value, {STRETCH_HI_PCT!r}) AS hi FROM r)
SELECT cell_row, cell_col,
       round(greatest(0.0, least(1.0, (value - lo) / (hi - lo))) * 255.0, 6) AS value
FROM r, st
"""


# -------------------------------------------------------- high-pass filter

HP_K = 5


def q_high_pass(spark, sf_dir):
    # HighPassFilter (image_analysis/highpass_filter.rs:378-379):
    # out = z - clamped-window mean (the engine mean_filter's semantics)
    from whitebox_tools_spark.operators.focal import mean_filter

    r = _raster(spark, sf_dir)
    mn = mean_filter(r, GRID, filter_x=HP_K, filter_y=HP_K, tile_size=TILE_SIZE)
    j = r.join(
        mn.select("row", "col", F.col("value").alias("mu")), ["row", "col"]
    )
    return j.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round(F.col("value") - F.col("mu"), 6).alias("value"),
    )


QUERIES["high_pass"] = q_high_pass


def _high_pass_sql() -> str:
    mid = HP_K // 2
    return f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
mn AS (SELECT min(value) AS m FROM r),
offs AS (SELECT a.i - {mid} AS dr, b.i - {mid} AS dc
         FROM range(0, {2 * mid + 1}) a(i), range(0, {2 * mid + 1}) b(i)),
j AS (SELECT c.cell_row, c.cell_col, c.value AS z, mn.m,
             sum(n.value - mn.m) AS s, count(*) AS cnt
      FROM r c CROSS JOIN mn CROSS JOIN offs o
      JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
      WHERE c.cell_row + o.dr >= 1 AND c.cell_col + o.dc >= 1
      GROUP BY c.cell_row, c.cell_col, c.value, mn.m)
SELECT cell_row, cell_col, round(z - (s / cnt + m), 6) AS value
FROM j
"""


ORACLE_SQL["high_pass"] = _high_pass_sql()


# ---------------------------------------- majority / percentile filters


def q_majority_filter(spark, sf_dir):
    from whitebox_tools_spark.operators.enhance import majority_filter

    return _aliased(
        majority_filter(_raster(spark, sf_dir), GRID, 3, 3, TILE_SIZE), round6=False
    )


def q_percentile_filter(spark, sf_dir):
    from whitebox_tools_spark.operators.enhance import percentile_filter

    return _aliased(
        percentile_filter(_raster(spark, sf_dir), GRID, 3, 3, TILE_SIZE)
    )


QUERIES["majority_filter"] = q_majority_filter
QUERIES["percentile_filter"] = q_percentile_filter


def _win3_cte() -> str:
    # all (center, neighbour-value) rows of the 3x3 window, center included,
    # only in-raster neighbours (NaN padding contributes nothing)
    return """offs AS (SELECT a.i - 1 AS dr, b.i - 1 AS dc
         FROM range(0, 3) a(i), range(0, 3) b(i)),
win AS (SELECT c.cell_row, c.cell_col, c.value AS z, n.value AS nv
        FROM r c CROSS JOIN offs o
        JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc)"""


ORACLE_SQL["majority_filter"] = f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_win3_cte()},
cnt AS (SELECT cell_row, cell_col, nv, count(*) AS c FROM win GROUP BY 1, 2, 3),
rk AS (SELECT cell_row, cell_col, nv,
              row_number() OVER (PARTITION BY cell_row, cell_col
                                 ORDER BY c DESC, nv ASC) AS rn
       FROM cnt)
SELECT cell_row, cell_col, nv AS value FROM rk WHERE rn = 1
"""

ORACLE_SQL["percentile_filter"] = f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_win3_cte()}
SELECT cell_row, cell_col,
       round(CAST(sum(CASE WHEN nv < z THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 100.0, 6) AS value
FROM win GROUP BY cell_row, cell_col
"""


# --------------------------------- joins, grids, kappa, signatures


def q_lidar_join(spark, sf_dir):
    # LidarJoin (lidar_join.rs): concatenate point files; sources tagged
    geo = _geo(spark, sf_dir)
    a = geo.where(F.pmod("doc_id", F.lit(2)) == 0).select(
        "doc_id", F.lit(0).alias("src")
    )
    b = geo.where(F.pmod("doc_id", F.lit(3)) == 0).select(
        "doc_id", F.lit(1).alias("src")
    )
    return a.unionByName(b)


CSV_LABELS = [(0, "water"), (1, "forest"), (2, "urban"), (3, "crop"), (4, "bare")]


def q_merge_table_csv(spark, sf_dir):
    # MergeTableWithCsv (merge_table_with_csv.rs): attribute-join a CSV
    # keyed table onto the layer's attribute table
    geo = _geo(spark, sf_dir).select("doc_id", F.col("cls").cast("long").alias("cls"))
    csv = local_df(spark, [dict(cls=c, label=l) for c, l in CSV_LABELS])
    return geo.join(csv, "cls", "left").select("doc_id", "cls", "label")


def q_rect_grid(spark, sf_dir):
    # CreateRectangularVectorGrid: one rect feature per grid cell
    rows = spark.range(GRID.rows).select(F.col("id").alias("cell_row"))
    cols = spark.range(GRID.cols).select(F.col("id").alias("cell_col"))
    g = rows.crossJoin(cols)
    return g.select(
        (F.col("cell_row") * GRID.cols + F.col("cell_col") + 1).alias("fid"),
        "cell_row", "cell_col",
        (F.lit(GRID.west) + F.col("cell_col") * GRID.res_x).alias("xmin"),
        (F.lit(GRID.north) - (F.col("cell_row") + 1) * GRID.res_y).alias("ymin"),
        (F.lit(GRID.west) + (F.col("cell_col") + 1) * GRID.res_x).alias("xmax"),
        (F.lit(GRID.north) - F.col("cell_row") * GRID.res_y).alias("ymax"),
    )


KAPPA_MOD = 4


def q_lidar_kappa(spark, sf_dir):
    # LidarKappaIndex: Cohen's kappa between two per-point classifications
    from whitebox_tools_spark.operators.enhance import kappa_index

    geo = _geo(spark, sf_dir)
    a = geo.select(F.col("doc_id").alias("row"), F.lit(0).alias("col"),
                   F.col("cls").cast("double").alias("value"))
    b = geo.select(F.col("doc_id").alias("row"), F.lit(0).alias("col"),
                   F.pmod("doc_id", F.lit(KAPPA_MOD)).cast("double").alias("value"))
    out = kappa_index(a, b)
    return out.select(
        F.round("kappa", 6).alias("kappa"),
        F.round("overall_accuracy", 6).alias("overall_accuracy"),
        "n",
    )


def q_max_diff_from_mean(spark, sf_dir):
    from whitebox_tools_spark.operators.terrain2 import max_elevation_deviation

    out = max_elevation_deviation(
        _raster(spark, sf_dir), GRID, radii=(1, 2, 3), tile_size=TILE_SIZE, stat="diff"
    )
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"), "scale",
    )


def q_max_elev_dev_signature(spark, sf_dir):
    from whitebox_tools_spark.operators.terrain import dev_from_mean_elev

    parts = []
    for r in (1, 2, 3):
        d = dev_from_mean_elev(_raster(spark, sf_dir), GRID, rx=r, ry=r, tile_size=TILE_SIZE)
        parts.append(
            d.select(
                F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
                F.round("value", 6).alias("value"),
                F.lit(r).cast("double").alias("scale"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def q_multiscale_roughness_signature(spark, sf_dir):
    from whitebox_tools_spark.catalog_misc2 import MR_RADII
    from whitebox_tools_spark.operators.terrain3 import spherical_stdev_of_normals

    parts = []
    for r in MR_RADII:
        d = spherical_stdev_of_normals(
            _raster(spark, sf_dir), GRID, rx=r, ry=r, tile_size=TILE_SIZE
        )
        parts.append(
            d.select(
                F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
                F.round("value", 6).alias("value"),
                F.lit(r).cast("double").alias("scale"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


QUERIES["lidar_join"] = q_lidar_join
QUERIES["merge_table_csv"] = q_merge_table_csv
QUERIES["rect_grid"] = q_rect_grid
QUERIES["lidar_kappa"] = q_lidar_kappa
QUERIES["max_diff_from_mean"] = q_max_diff_from_mean
QUERIES["max_elev_dev_signature"] = q_max_elev_dev_signature
QUERIES["multiscale_roughness_signature"] = q_multiscale_roughness_signature


def _win_cte(radius: int, tag: str) -> str:
    """Windowed sum/count CTE over raster r at a given radius."""
    return f"""o{tag} AS (SELECT a.i - {radius} AS dr, b.i - {radius} AS dc
         FROM range(0, {2 * radius + 1}) a(i), range(0, {2 * radius + 1}) b(i)),
w{tag} AS (SELECT c.cell_row, c.cell_col, any_value(c.value) AS z,
       count(*) AS n, sum(nb.value) AS s, sum(nb.value * nb.value) AS ss
FROM r c CROSS JOIN o{tag}
JOIN r nb ON nb.cell_row = c.cell_row + o{tag}.dr AND nb.cell_col = c.cell_col + o{tag}.dc
GROUP BY c.cell_row, c.cell_col)"""


_DEV_SEL = """CASE WHEN (ss - (s * s) / n) / n > 0.0
        THEN (z - s / n) / sqrt((ss - (s * s) / n) / n) ELSE 0.0 END"""
_DIFF_SEL = "z - s / n"


def _multi_window_sql(sel: str, argmax: bool) -> str:
    ctes = ",\n".join(_win_cte(r, f"r{r}") for r in (1, 2, 3))
    union = "\nUNION ALL ".join(
        f"SELECT cell_row, cell_col, {sel} AS value, CAST({r} AS DOUBLE) AS scale FROM wr{r}"
        for r in (1, 2, 3)
    )
    tail = (
        """QUALIFY row_number() OVER (PARTITION BY cell_row, cell_col
                           ORDER BY abs(value) DESC, scale ASC) = 1"""
        if argmax
        else ""
    )
    return f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{ctes},
u AS ({union})
SELECT cell_row, cell_col, round(value, 6) AS value, scale FROM u
{tail}
"""


def _mr_signature_sql() -> str:
    from whitebox_tools_spark.catalog_misc2 import (
        MR_RADII, _ASPECT_CTE, _sphere_cte,
    )

    union = "\nUNION ALL ".join(
        f"SELECT cell_row, cell_col, value, CAST({r} AS DOUBLE) AS scale FROM s{i+1}"
        for i, r in enumerate(MR_RADII)
    )
    spheres = ",\n".join(_sphere_cte(r, f"s{i+1}") for i, r in enumerate(MR_RADII))
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_ASPECT_CTE},
nrm AS MATERIALIZED (SELECT cell_row, cell_col,
      -fx / sqrt(fx * fx + fy * fy + 1.0) AS nx,
      -fy / sqrt(fx * fx + fy * fy + 1.0) AS ny,
      1.0 / sqrt(fx * fx + fy * fy + 1.0) AS nz
      FROM drv),
{spheres},
u AS ({union})
SELECT cell_row, cell_col, round(value, 6) AS value, scale FROM u"""


def _csv_values_sql() -> str:
    vals = ", ".join(f"({c}, '{l}')" for c, l in CSV_LABELS)
    return f"(VALUES {vals}) AS c(cls, label)"


ORACLE_SQL["lidar_join"] = f"""
WITH {_PTS_CTE}
SELECT doc_id, 0 AS src FROM pts WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, 1 AS src FROM pts WHERE doc_id % 3 = 0
"""
ORACLE_SQL["merge_table_csv"] = f"""
WITH {_PTS_CTE}
SELECT p.doc_id, CAST(p.cls AS BIGINT) AS cls, c.label
FROM pts p LEFT JOIN {_csv_values_sql()} ON c.cls = CAST(p.cls AS BIGINT)
"""
ORACLE_SQL["rect_grid"] = f"""
SELECT CAST(cell_row * {GRID.cols} + cell_col + 1 AS BIGINT) AS fid,
       cell_row, cell_col,
       CAST({GRID.west!r} + cell_col * {GRID.res_x!r} AS DOUBLE) AS xmin,
       CAST({GRID.north!r} - (cell_row + 1) * {GRID.res_y!r} AS DOUBLE) AS ymin,
       CAST({GRID.west!r} + (cell_col + 1) * {GRID.res_x!r} AS DOUBLE) AS xmax,
       CAST({GRID.north!r} - cell_row * {GRID.res_y!r} AS DOUBLE) AS ymax
FROM (SELECT CAST(a.i AS BIGINT) AS cell_row, CAST(b.i AS BIGINT) AS cell_col
      FROM range(0, {GRID.rows}) a(i), range(0, {GRID.cols}) b(i)) g
"""
ORACLE_SQL["lidar_kappa"] = f"""
WITH {_PTS_CTE},
cls AS (SELECT CAST(round(cls) AS BIGINT) AS ca,
               CAST(round(doc_id % {KAPPA_MOD}) AS BIGINT) AS cb FROM pts),
n AS (SELECT count(*) AS n FROM cls),
agree AS (SELECT count(*) AS a FROM cls WHERE ca = cb),
ma AS (SELECT ca AS c, count(*) AS ra FROM cls GROUP BY ca),
mb AS (SELECT cb AS c, count(*) AS cb_n FROM cls GROUP BY cb),
exp_ AS (SELECT coalesce(sum(ma.ra * mb.cb_n), 0) AS e
         FROM ma JOIN mb ON ma.c = mb.c)
SELECT round(((CAST(a AS DOUBLE) / n) - (CAST(e AS DOUBLE) / (CAST(n AS DOUBLE) * n)))
             / (1.0 - (CAST(e AS DOUBLE) / (CAST(n AS DOUBLE) * n))), 6) AS kappa,
       round(CAST(a AS DOUBLE) / n, 6) AS overall_accuracy,
       n
FROM n, agree, exp_
"""
ORACLE_SQL["max_diff_from_mean"] = _multi_window_sql(_DIFF_SEL, argmax=True)
ORACLE_SQL["max_elev_dev_signature"] = _multi_window_sql(_DEV_SEL, argmax=False)
ORACLE_SQL["multiscale_roughness_signature"] = _mr_signature_sql()


# ------------------------------------------------------- DInf mass flux

FLUXD_ROUNDS = 64


def q_dinf_mass_flux(spark, sf_dir):
    from whitebox_tools_spark.operators import raster as rop
    from whitebox_tools_spark.operators.dinf2 import dinf_mass_flux

    geo = _geo(spark, sf_dir)
    z = _raster(spark, sf_dir)
    loading = z
    cls = rop.points_to_raster(geo, GRID, assign="max", field="cls")
    eff = cls.select("row", "col", (F.col("value") / 20.0 + 0.5).alias("value"))
    absorb = rop.points_to_raster(geo, GRID, assign="first").select(
        "row", "col", (F.col("value") * 0.1).alias("value")
    )
    out = dinf_mass_flux(loading, eff, absorb, z, GRID, FLUXD_ROUNDS, TILE_SIZE)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES["dinf_mass_flux"] = q_dinf_mass_flux


def _dinf_flux_sql() -> str:
    from whitebox_tools_spark.catalog_dinf import _dinf_accum_sql

    base = _dinf_accum_sql()
    head, _ = base.split("a0 AS", 1)
    blocks = [
        f"""bands AS MATERIALIZED (
  SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col,
         arg_max(z, doc_id) AS l,
         CAST(max(cls) AS DOUBLE) / 20.0 + 0.5 AS e,
         arg_min(z, doc_id) * 0.1 AS ab
  FROM pts WHERE {_IN_GRID_SQL}
  GROUP BY cell_row, cell_col),
nodesf AS MATERIALIZED (SELECT b.cell_row, b.cell_col,
        b.cell_row * {GRID.cols} + b.cell_col AS id, b.l, b.e, b.ab
        FROM bands b JOIN ddir d ON d.cell_row = b.cell_row AND d.cell_col = b.cell_col),
edf AS MATERIALIZED (SELECT e.a, e.b, e.w FROM ed e
        JOIN nodesf x ON x.id = e.a JOIN nodesf y ON y.id = e.b),
f0 AS MATERIALIZED (SELECT id, (l - ab) * e AS val FROM nodesf)"""
    ]
    for i in range(1, FLUXD_ROUNDS + 1):
        blocks.append(
            f"f{i} AS MATERIALIZED (SELECT z.id, "
            f"(coalesce(u.s, 0.0) + z.l - z.ab) * z.e AS val "
            f"FROM nodesf z LEFT JOIN (SELECT e.b, sum(e.w * p.val) AS s "
            f"FROM edf e JOIN f{i-1} p ON p.id = e.a GROUP BY e.b) u ON u.b = z.id)"
        )
    joined = ",\n".join(blocks)
    return f"""{head.rstrip().rstrip(',')},
{joined}
SELECT CAST(id // {GRID.cols} AS BIGINT) AS cell_row,
       CAST(id % {GRID.cols} AS BIGINT) AS cell_col,
       round(CAST(val AS DOUBLE), 6) AS value
FROM f{FLUXD_ROUNDS}"""


ORACLE_SQL["dinf_mass_flux"] = _dinf_flux_sql()


# -------------------------------------- histogram matching (uniform target)


def q_histogram_matching_uniform(spark, sf_dir):
    # HistogramMatching (image_analysis/histogram_matching.rs) with the
    # catalog's target histogram = uniform on [0, 255]: the target
    # quantile function is t -> 255 t, so out = cdf(z) * 255 with
    # cdf = P(value <= z). Computed via a value-level aggregation +
    # running sum over distinct values (no whole-raster single-partition
    # window).
    from whitebox_tools_spark.operators import enhance as _enh
    out = _enh.histogram_matching_uniform(_raster(spark, sf_dir), 256)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES["histogram_matching_uniform"] = q_histogram_matching_uniform

ORACLE_SQL["histogram_matching_uniform"] = f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM r),
cdf AS (SELECT a.value, CAST(count(*) AS DOUBLE) AS cum
        FROM (SELECT DISTINCT value FROM r) a
        JOIN r b ON b.value <= a.value GROUP BY a.value)
SELECT r.cell_row, r.cell_col, round(cdf.cum / n.n * 255.0, 6) AS value
FROM r JOIN cdf ON cdf.value = r.value CROSS JOIN n
"""


# ------------------------------- gaussian contrast stretch (probit map)

# Acklam's rational approximation of the inverse normal CDF; the SAME
# coefficient chain is rendered once as a Spark Column and once as SQL
# text, so both engines evaluate an identical double-precision
# expression tree.
_ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
          1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
          6.680131188771972e+01, -1.328068155288572e+01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
          -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
          3.754408661907416e+00)
_ACK_PLOW = 0.02425


def _horner_sql(coeffs, var):
    out = repr(coeffs[0])
    for c in coeffs[1:]:
        out = f"({out} * {var} + {repr(c)})"
    return out


def _probit_sql(p: str) -> str:
    ql = f"sqrt(-2.0 * ln({p}))"
    qh = f"sqrt(-2.0 * ln(1.0 - {p}))"
    qm = f"({p} - 0.5)"
    rm = f"({qm} * {qm})"
    low = f"({_horner_sql(_ACK_C, ql)}) / ({_horner_sql(_ACK_D, ql)} * {ql} + 1.0)"
    high = f"-(({_horner_sql(_ACK_C, qh)}) / ({_horner_sql(_ACK_D, qh)} * {qh} + 1.0))"
    mid = (
        f"({_horner_sql(_ACK_A, rm)}) * {qm} / ({_horner_sql(_ACK_B, rm)} * {rm} + 1.0)"
    )
    return (
        f"CASE WHEN {p} < {_ACK_PLOW!r} THEN {low} "
        f"WHEN {p} > {1.0 - _ACK_PLOW!r} THEN {high} ELSE {mid} END"
    )


# Column-side probit now lives with the operator (operators.enhance
# probit_col); the SQL renderer below stays here with the oracles.


def q_gaussian_stretch(spark, sf_dir):
    # GaussianContrastStretch (gaussian_contrast_stretch.rs, engine form):
    # histogram-match the raster onto a standard gaussian — out =
    # probit((rank - 0.5) / n) via Acklam's approximation (the reference
    # interpolates a binned gaussian CDF lookup instead).
    from whitebox_tools_spark.operators import enhance as _enh
    out = _enh.gaussian_contrast_stretch(_raster(spark, sf_dir))
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES["gaussian_stretch"] = q_gaussian_stretch

ORACLE_SQL["gaussian_stretch"] = f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM r),
cdf AS (SELECT a.value, (CAST(count(*) AS DOUBLE) - 0.5) AS cum
        FROM (SELECT DISTINCT value FROM r) a
        JOIN r b ON b.value <= a.value GROUP BY a.value)
SELECT r.cell_row, r.cell_col,
       round({_probit_sql("(cdf.cum / n.n)")}, 6) AS value
FROM r JOIN cdf ON cdf.value = r.value CROSS JOIN n
"""


# ----------------------------------------- eliminate coincident points

COINC_TOL = 25.0
_MIS_DEPTH = 8  # unrolled greedy depth >= longest decreasing conflict chain


def q_eliminate_coincident(spark, sf_dir):
    from whitebox_tools_spark.operators.attributes import eliminate_coincident_points

    geo = _geo(spark, sf_dir)
    out = eliminate_coincident_points(geo.select("doc_id", "x", "y"), COINC_TOL)
    return out.select("doc_id")


QUERIES["eliminate_coincident"] = q_eliminate_coincident


def _eliminate_sql() -> str:
    tol2 = COINC_TOL * COINC_TOL
    levels = [
        f"""k0 AS (SELECT doc_id FROM pts
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.p = pts.doc_id))"""
    ]
    for i in range(1, _MIS_DEPTH + 1):
        levels.append(
            f"""k{i} AS (SELECT doc_id FROM pts
      WHERE NOT EXISTS (SELECT 1 FROM e JOIN k{i-1} k ON k.doc_id = e.q
                        WHERE e.p = pts.doc_id))"""
        )
    joined = ",\n".join(levels)
    return f"""
WITH {_PTS_CTE},
e AS (SELECT a.doc_id AS p, b.doc_id AS q
      FROM pts a JOIN pts b ON b.doc_id < a.doc_id
      AND ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) < {tol2!r}),
{joined}
SELECT doc_id FROM k{_MIS_DEPTH}
"""


ORACLE_SQL["eliminate_coincident"] = _eliminate_sql()


# -------------------------------------------------- modified k-means

MK_K0 = 6
MK_ITERS = 12
MK_MERGE = 120.0
MK_FEATS = ("x", "y", "z")


def q_modified_kmeans(spark, sf_dir):
    from whitebox_tools_spark.operators.cluster import modified_kmeans

    geo = _geo(spark, sf_dir)
    assigned, _ = modified_kmeans(
        geo.select("doc_id", *MK_FEATS), list(MK_FEATS), MK_K0, MK_MERGE,
        max_iter=MK_ITERS,
    )
    return assigned.select("doc_id", F.col("cluster").cast("int").alias("cluster"))


QUERIES["modified_kmeans"] = q_modified_kmeans


_GEO_SQL_MK = derive.sql_geometry_select("doc_id")


def _modified_kmeans_sql() -> str:
    fs = MK_FEATS
    thr2 = MK_MERGE * MK_MERGE
    init = (
        f"c0 AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS cluster, "
        + ", ".join(f"{f} AS c{f}" for f in fs)
        + f" FROM (SELECT * FROM pts ORDER BY doc_id LIMIT {MK_K0}))"
    )
    blocks = [init]
    d = " + ".join(f"(p.{f} - c.c{f}) * (p.{f} - c.c{f})" for f in fs)
    cdist = " + ".join(f"(a.c{f} - b.c{f}) * (a.c{f} - b.c{f})" for f in fs)
    upd = ", ".join(f"avg({f}) AS m{f}" for f in fs)
    keep = ", ".join(f"coalesce(round(u.m{f}, 6), c.c{f}) AS c{f}" for f in fs)
    for i in range(1, MK_ITERS + 1):
        blocks.append(
            f"a{i} AS MATERIALIZED (SELECT p.doc_id, c.cluster, {d} AS d "
            f"FROM pts p CROSS JOIN c{i-1} c)"
        )
        blocks.append(
            f"b{i} AS MATERIALIZED (SELECT doc_id, cluster FROM a{i} "
            f"QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY d, cluster) = 1)"
        )
        blocks.append(
            f"u{i} AS MATERIALIZED (SELECT b.cluster, {upd} FROM b{i} b JOIN pts USING (doc_id) "
            f"GROUP BY b.cluster)"
        )
        blocks.append(
            f"cc{i} AS MATERIALIZED (SELECT c.cluster, {keep} FROM c{i-1} c LEFT JOIN u{i} u "
            f"ON u.cluster = c.cluster)"
        )
        blocks.append(
            f"mg{i} AS MATERIALIZED (SELECT a.cluster, "
            f"coalesce(min(CASE WHEN b.cluster < a.cluster AND {cdist} < {thr2!r} "
            f"THEN b.cluster END), a.cluster) AS target "
            f"FROM cc{i} a CROSS JOIN cc{i} b GROUP BY a.cluster)"
        )
        blocks.append(
            f"c{i} AS MATERIALIZED (SELECT c.* FROM cc{i} c "
            f"WHERE c.cluster IN (SELECT DISTINCT target FROM mg{i}))"
        )
    # final assignment over the surviving centers
    blocks.append(
        f"af AS MATERIALIZED (SELECT p.doc_id, c.cluster, {d} AS d "
        f"FROM pts p CROSS JOIN c{MK_ITERS} c)"
    )
    return (
        f"WITH pts_base AS (SELECT doc_id, {_GEO_SQL_MK} FROM documents), pts AS MATERIALIZED (SELECT * FROM pts_base),\n" + ",\n".join(blocks)
        + "\nSELECT doc_id, CAST(cluster AS INTEGER) AS cluster FROM af "
        "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY d, cluster) = 1"
    )


ORACLE_SQL["modified_kmeans"] = _modified_kmeans_sql()


# ------------------------------------------- long profile from points

LPP_MOD = 113


def q_long_profile_points(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators.terrain3 import long_profile_from_points

    geo = _geo(spark, sf_dir).where(F.pmod("doc_id", F.lit(LPP_MOD)) == 0)
    cell_r = F.floor((F.lit(GRID.north) - F.col("y")) / F.lit(GRID.res_y)).cast("long")
    cell_c = F.floor((F.col("x") - F.lit(GRID.west)) / F.lit(GRID.res_x)).cast("long")
    seeds = geo.select(cell_r.alias("row"), cell_c.alias("col")).where(
        (F.col("row") >= 0) & (F.col("row") < GRID.rows)
        & (F.col("col") >= 0) & (F.col("col") < GRID.cols)
    )
    dirs = _cc.dirs(spark, sf_dir)
    # keep only seeds on raster cells
    seeds = seeds.join(dirs.select("row", "col"), ["row", "col"], "left_semi")
    out = long_profile_from_points(seeds, dirs, _raster(spark, sf_dir), GRID)
    return out.select(
        "seed", "cell_row", "cell_col", F.round("dist", 6).alias("dist"), "z"
    )


QUERIES["long_profile_points"] = q_long_profile_points


def _lpp_sql() -> str:
    import math as _math

    from whitebox_tools_spark.catalog_iter import _Z_CTE, _d8_dir_sql
    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY

    diag = _math.sqrt(GRID.res_x * GRID.res_x + GRID.res_y * GRID.res_y)
    lens = [diag, GRID.res_x, diag, GRID.res_y, diag, GRID.res_x, diag, GRID.res_y]
    dxs = "[" + ",".join(str(v) for v in D8_DX) + "]"
    dys = "[" + ",".join(str(v) for v in D8_DY) + "]"
    lns = "[" + ",".join(repr(v) for v in lens) + "]"
    return f"""
WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
dmap AS MATERIALIZED (SELECT cell_row, cell_col,
        cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
tgt AS MATERIALIZED (SELECT d.id,
        d.cell_row + {dys}[d.dir + 1] AS nr, d.cell_col + {dxs}[d.dir + 1] AS nc,
        {lns}[d.dir + 1] AS len
      FROM dmap d WHERE d.dir >= 0),
step AS MATERIALIZED (SELECT t.id, m.id AS nxt, t.len
      FROM tgt t JOIN dmap m ON m.cell_row = t.nr AND m.cell_col = t.nc),
seeds AS MATERIALIZED (
  SELECT DISTINCT ({_ROW_SQL}) * {GRID.cols} + ({_COL_SQL}) AS seed
  FROM pts WHERE doc_id % {LPP_MOD} = 0 AND {_IN_GRID_SQL}
    AND EXISTS (SELECT 1 FROM dmap m
                WHERE m.id = ({_ROW_SQL}) * {GRID.cols} + ({_COL_SQL}))),
wk AS (SELECT seed, seed AS cur, CAST(0.0 AS DOUBLE) AS dist FROM seeds
       UNION
       SELECT w.seed, s.nxt, w.dist + s.len
       FROM wk w JOIN step s ON s.id = w.cur)
SELECT w.seed, CAST(w.cur // {GRID.cols} AS BIGINT) AS cell_row,
       CAST(w.cur % {GRID.cols} AS BIGINT) AS cell_col,
       round(w.dist, 6) AS dist, r.value AS z
FROM wk w JOIN r ON r.cell_row = w.cur // {GRID.cols}
               AND r.cell_col = w.cur % {GRID.cols}
"""


ORACLE_SQL["long_profile_points"] = _lpp_sql()
