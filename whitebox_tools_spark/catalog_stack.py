"""Query catalog: raster-stack positional / percent / overlay tools and
the grid-utility family (SURVEY.md §2.5; reference math_stat_analysis +
gis_analysis one-file-per-tool) — per-tool DuckDB oracle rows.

All arithmetic here is IEEE-deterministic (+,-,*,/, floor, comparisons,
greatest/least), so every row hashes bit-identical with no quantization.
The stack fixtures are the three derived rasters (last / min / max of z
per cell — same occupied cell set, so the long-form full-outer aligns
degenerate to an inner join and plain SQL JOINs mirror it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE
from whitebox_tools_spark.catalog_local import _geo, _r, _raster_cte
from whitebox_tools_spark.operators import local_math as lm
from whitebox_tools_spark.operators import raster as rop

CELL_AREA = GRID.res_x * GRID.res_y  # 2500.0
_ABC = [("a", "arg_max(z, doc_id)"), ("b", "min(z)"), ("c", "max(z)")]


def _stack3(spark, sf_dir):
    return [_r(spark, sf_dir, m) for m in ("last", "min", "max")]


def _ctes3() -> str:
    return ",\n".join(_raster_cte(n, agg) for n, agg in _ABC)


def _join3(select: str) -> str:
    return f"""
WITH {_PTS_CTE},
{_ctes3()}
SELECT a.cell_row, a.cell_col, {select} AS value
FROM ra a JOIN rb b USING (cell_row, cell_col)
          JOIN rc c USING (cell_row, cell_col)
"""


def _one(select: str, agg: str = "arg_max(z, doc_id)") -> str:
    return f"""
WITH {_PTS_CTE},
{_raster_cte("a", agg)}
SELECT cell_row, cell_col, {select} AS value FROM ra
"""


def _cells(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


# ---------------------------------------------------------- overlay folds


def q_max_overlay(spark, sf_dir):
    return _cells(lm.overlay(_stack3(spark, sf_dir), "max"))


def q_min_overlay(spark, sf_dir):
    return _cells(lm.overlay(_stack3(spark, sf_dir), "min"))


def q_sum_overlay(spark, sf_dir):
    return _cells(lm.overlay(_stack3(spark, sf_dir), "sum"))


def _signed(rs):
    return [
        r.select("row", "col", (F.col("value") - F.lit(50.0)).alias("value"))
        for r in rs
    ]


def q_max_abs_overlay(spark, sf_dir):
    return _cells(lm.overlay(_signed(_stack3(spark, sf_dir)), "max_abs"))


def q_min_abs_overlay(spark, sf_dir):
    return _cells(lm.overlay(_signed(_stack3(spark, sf_dir)), "min_abs"))


def q_highest_position(spark, sf_dir):
    return _cells(lm.highest_position(_stack3(spark, sf_dir)))


def q_lowest_position(spark, sf_dir):
    return _cells(lm.lowest_position(_stack3(spark, sf_dir)))


def q_weighted_sum(spark, sf_dir):
    return _cells(lm.weighted_sum(_stack3(spark, sf_dir), [0.25, 0.5, 2.0]))


def q_weighted_overlay(spark, sf_dir):
    return _cells(
        lm.weighted_overlay(
            _stack3(spark, sf_dir), [0.25, 0.5, 0.25], costs=[False, True, False]
        )
    )


def q_count_if(spark, sf_dir):
    rs = [
        r.select("row", "col", F.floor(F.col("value") / F.lit(10.0)).cast("double").alias("value"))
        for r in _stack3(spark, sf_dir)
    ]
    return _cells(lm.count_if(rs, 5.0))


def q_pick_from_list(spark, sf_dir):
    rs = _stack3(spark, sf_dir)
    pos = rs[2].select(
        "row", "col",
        (F.floor(F.col("value")).cast("double") % F.lit(3.0) + F.lit(1.0)).alias("value"),
    )
    return _cells(lm.pick_from_list(rs, pos))


def q_percent_eq(spark, sf_dir):
    rs = _stack3(spark, sf_dir)
    dec = [
        r.select("row", "col", F.floor(F.col("value") / F.lit(10.0)).cast("double").alias("value"))
        for r in rs
    ]
    return _cells(lm.percent_stack(dec[:2], dec[2], "eq"))


def q_percent_gt(spark, sf_dir):
    rs = _stack3(spark, sf_dir)
    return _cells(lm.percent_stack(rs[:2], rs[2], "gt"))


def q_percent_lt(spark, sf_dir):
    rs = _stack3(spark, sf_dir)
    return _cells(lm.percent_stack(rs[:2], rs[2], "lt"))


def q_pansharpen(spark, sf_dir):
    rs = _stack3(spark, sf_dir)
    pan = (
        rs[1]
        .select("row", "col", F.col("value").alias("_b"))
        .join(rs[2].select("row", "col", F.col("value").alias("_c")), ["row", "col"])
        .select("row", "col", ((F.col("_b") + F.col("_c")) / F.lit(2.0)).alias("value"))
    )
    return _cells(lm.pansharpen_brovey(rs, pan)[0])


# ------------------------------------------------------- grid utilities


def q_create_plane(spark, sf_dir):
    return _cells(lm.create_plane(spark, GRID, 0.01, -0.02, 5.0))


def q_new_raster_from_base(spark, sf_dir):
    return _cells(lm.new_raster_from_base(_r(spark, sf_dir, "last"), 7.0))


def _floored(spark, sf_dir):
    return _r(spark, sf_dir, "last").select(
        "row", "col", F.floor("value").cast("double").alias("value")
    )


def q_set_nodata(spark, sf_dir):
    return _cells(lm.set_nodata_value(_floored(spark, sf_dir), 42.0))


def _nully(spark, sf_dir):
    v = F.col("value")
    return _r(spark, sf_dir, "last").select(
        "row", "col", F.when(v > F.lit(50.0), None).otherwise(v).alias("value")
    )


def q_modify_nodata(spark, sf_dir):
    return _cells(lm.modify_nodata_value(_nully(spark, sf_dir), -9999.0))


def q_convert_nodata_zero(spark, sf_dir):
    return _cells(lm.convert_nodata_to_zero(_nully(spark, sf_dir)))


def q_cell_assign_x(spark, sf_dir):
    return _cells(lm.raster_cell_assignment(_r(spark, sf_dir, "last"), GRID, "x"))


def q_raster_area(spark, sf_dir):
    cls_pts = _geo(spark, sf_dir).withColumn("clsd", F.col("cls").cast("double"))
    cls_raster = rop.points_to_raster(cls_pts, GRID, assign="last", field="clsd")
    return lm.raster_area(cls_raster, CELL_AREA)


def q_reclass_equal_interval(spark, sf_dir):
    return _cells(lm.reclass_equal_interval(_r(spark, sf_dir, "last"), 7.5))


def q_rescale_range(spark, sf_dir):
    return _cells(lm.rescale_value_range(_r(spark, sf_dir, "last"), 5.0, 10.0))


def q_cume_dist(spark, sf_dir):
    return _cells(lm.cumulative_distribution(_r(spark, sf_dir, "last")))


def q_quantiles(spark, sf_dir):
    return _cells(lm.quantiles(_r(spark, sf_dir, "last"), 5))


QUERIES = {
    "max_overlay": q_max_overlay,
    "min_overlay": q_min_overlay,
    "sum_overlay": q_sum_overlay,
    "max_abs_overlay": q_max_abs_overlay,
    "min_abs_overlay": q_min_abs_overlay,
    "highest_position": q_highest_position,
    "lowest_position": q_lowest_position,
    "weighted_sum_overlay": q_weighted_sum,
    "weighted_overlay": q_weighted_overlay,
    "count_if": q_count_if,
    "pick_from_list": q_pick_from_list,
    "percent_eq": q_percent_eq,
    "percent_gt": q_percent_gt,
    "percent_lt": q_percent_lt,
    "pansharpen_brovey": q_pansharpen,
    "create_plane": q_create_plane,
    "new_raster_from_base": q_new_raster_from_base,
    "set_nodata": q_set_nodata,
    "modify_nodata": q_modify_nodata,
    "convert_nodata_zero": q_convert_nodata_zero,
    "cell_assign_x": q_cell_assign_x,
    "raster_area": q_raster_area,
    "reclass_equal_interval": q_reclass_equal_interval,
    "rescale_range": q_rescale_range,
    "cume_dist": q_cume_dist,
    "quantiles_bins": q_quantiles,
}

# pre-built SQL fragments ---------------------------------------------------

_MAXABS_BEST01 = (
    "(CASE WHEN abs(b.value - 50.0) > abs(a.value - 50.0) "
    "THEN b.value - 50.0 ELSE a.value - 50.0 END)"
)
_MINABS_BEST01 = (
    "(CASE WHEN abs(b.value - 50.0) < abs(a.value - 50.0) "
    "THEN b.value - 50.0 ELSE a.value - 50.0 END)"
)
_DEC = "CAST(floor({v} / 10.0) AS DOUBLE)"

_RESCALE01 = (
    "(0.0 + ({v} - {lo}) / ({hi} - {lo}) * 1.0)"
)


def _wov_sql() -> str:
    # per-raster min/max stats CTEs + the same rescale/invert/sum order
    stats = ",\n".join(
        f"s{n} AS (SELECT min(value) AS lo, max(value) AS hi FROM r{n})"
        for n, _ in _ABC
    )
    ra = _RESCALE01.format(v="a.value", lo="sa.lo", hi="sa.hi")
    rb = "(1.0 - " + _RESCALE01.format(v="b.value", lo="sb.lo", hi="sb.hi") + ")"
    rc = _RESCALE01.format(v="c.value", lo="sc.lo", hi="sc.hi")
    return f"""
WITH {_PTS_CTE},
{_ctes3()},
{stats}
SELECT a.cell_row, a.cell_col,
       CAST({ra} * 0.25 + {rb} * 0.5 + {rc} * 0.25 AS DOUBLE) AS value
FROM ra a JOIN rb b USING (cell_row, cell_col)
          JOIN rc c USING (cell_row, cell_col)
CROSS JOIN sa CROSS JOIN sb CROSS JOIN sc
"""


ORACLE_SQL = {
    "max_overlay": _join3("greatest(a.value, b.value, c.value)"),
    "min_overlay": _join3("least(a.value, b.value, c.value)"),
    "sum_overlay": _join3("0.0 + a.value + b.value + c.value"),
    "max_abs_overlay": _join3(
        f"CASE WHEN abs(c.value - 50.0) > abs({_MAXABS_BEST01}) "
        f"THEN c.value - 50.0 ELSE {_MAXABS_BEST01} END"
    ),
    "min_abs_overlay": _join3(
        f"CASE WHEN abs(c.value - 50.0) < abs({_MINABS_BEST01}) "
        f"THEN c.value - 50.0 ELSE {_MINABS_BEST01} END"
    ),
    "highest_position": _join3(
        "CAST(CASE WHEN c.value > greatest(a.value, b.value) THEN 3.0 "
        "WHEN b.value > a.value THEN 2.0 ELSE 1.0 END AS DOUBLE)"
    ),
    "lowest_position": _join3(
        "CAST(CASE WHEN c.value < least(a.value, b.value) THEN 3.0 "
        "WHEN b.value < a.value THEN 2.0 ELSE 1.0 END AS DOUBLE)"
    ),
    "weighted_sum_overlay": _join3(
        "a.value * 0.25 + b.value * 0.5 + c.value * 2.0"
    ),
    "weighted_overlay": _wov_sql(),
    "count_if": _join3(
        # zero matches -> NULL (nodata), the reference's guarded-increment
        # semantics (count_if.rs:243-248)
        "NULLIF(CAST((CASE WHEN " + _DEC.format(v="a.value") + " = 5.0 THEN 1.0 ELSE 0.0 END) + "
        "(CASE WHEN " + _DEC.format(v="b.value") + " = 5.0 THEN 1.0 ELSE 0.0 END) + "
        "(CASE WHEN " + _DEC.format(v="c.value") + " = 5.0 THEN 1.0 ELSE 0.0 END) AS DOUBLE), 0.0)"
    ),
    "pick_from_list": _join3(
        "CASE CAST(round(fmod(CAST(floor(c.value) AS DOUBLE), 3.0) + 1.0) AS INT) "
        "WHEN 1 THEN a.value WHEN 2 THEN b.value WHEN 3 THEN c.value END"
    ),
    "percent_eq": _join3(
        "CAST(((CASE WHEN " + _DEC.format(v="a.value") + " = " + _DEC.format(v="c.value")
        + " THEN 1.0 ELSE 0.0 END) + (CASE WHEN " + _DEC.format(v="b.value") + " = "
        + _DEC.format(v="c.value") + " THEN 1.0 ELSE 0.0 END)) * 100.0 / 2.0 AS DOUBLE)"
    ),
    "percent_gt": _join3(
        "CAST(((CASE WHEN a.value > c.value THEN 1.0 ELSE 0.0 END) + "
        "(CASE WHEN b.value > c.value THEN 1.0 ELSE 0.0 END)) * 100.0 / 2.0 AS DOUBLE)"
    ),
    "percent_lt": _join3(
        "CAST(((CASE WHEN a.value < c.value THEN 1.0 ELSE 0.0 END) + "
        "(CASE WHEN b.value < c.value THEN 1.0 ELSE 0.0 END)) * 100.0 / 2.0 AS DOUBLE)"
    ),
    "pansharpen_brovey": _join3(
        "a.value * ((b.value + c.value) / 2.0) / ((a.value + b.value + c.value) / 3.0)"
    ),
    "create_plane": f"""
SELECT CAST(floor(i / {GRID.cols}) AS BIGINT) AS cell_row,
       CAST(i % {GRID.cols} AS BIGINT) AS cell_col,
       ({GRID.west!r} + {GRID.res_x / 2.0!r} + CAST(i % {GRID.cols} AS DOUBLE) * {GRID.res_x!r}) * 0.01
       + ({GRID.north!r} - {GRID.res_y / 2.0!r} - CAST(floor(i / {GRID.cols}) AS DOUBLE) * {GRID.res_y!r}) * (-0.02)
       + 5.0 AS value
FROM range(0, {GRID.rows * GRID.cols}) t(i)
""",
    "new_raster_from_base": _one("CAST(7.0 AS DOUBLE)"),
    "set_nodata": _one(
        "CASE WHEN CAST(floor(value) AS DOUBLE) = 42.0 THEN NULL "
        "ELSE CAST(floor(value) AS DOUBLE) END"
    ),
    "modify_nodata": _one(
        "CASE WHEN value > 50.0 THEN -9999.0 ELSE value END"
    ),
    "convert_nodata_zero": _one(
        "CASE WHEN value > 50.0 THEN 0.0 ELSE value END"
    ),
    "cell_assign_x": _one(
        f"({GRID.west!r} + {GRID.res_x / 2.0!r} + CAST(cell_col AS DOUBLE) * {GRID.res_x!r})"
    ),
    "raster_area": f"""
WITH {_PTS_CTE},
{_raster_cte("a", "arg_max(CAST(cls AS DOUBLE), doc_id)")}
SELECT value AS class, CAST(count(*) * {CELL_AREA!r} AS DOUBLE) AS area
FROM ra GROUP BY value
""",
    "reclass_equal_interval": _one(
        "CAST(floor((value - 0.0) / 7.5) AS DOUBLE) * 7.5 + 0.0"
    ),
    "rescale_range": _one(
        "5.0 + (value - (SELECT min(value) FROM ra)) "
        "/ ((SELECT max(value) FROM ra) - (SELECT min(value) FROM ra)) * 5.0"
    ),
    "cume_dist": _one(
        "cume_dist() OVER (ORDER BY value)"
    ),
    "quantiles_bins": _one(
        "least(5.0, greatest(1.0, CAST(ceil(cume_dist() OVER (ORDER BY value) * 5.0) AS DOUBLE)))"
    ),
}
