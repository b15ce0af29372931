"""Query catalog: MaxAnisotropyDev (+Signature). The oracle transcribes
the integral-image window cumsums and the five pane DEV formulas with
the same fold order as operators/anisotropy.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE, _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.operators import anisotropy as an

MIN_SCALE, MAX_SCALE, STEP = 3, 5, 2
SIG_MOD = 11


def _z(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc

    return _cc.z_last(spark, sf_dir)


def q_max_anisotropy_dev(spark, sf_dir):
    out = an.max_anisotropy_dev(_z(spark, sf_dir), GRID, MIN_SCALE, MAX_SCALE, STEP)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("mag", 6).alias("mag"), F.col("scale").cast("int").alias("scale"),
    )


def q_max_anisotropy_sig(spark, sf_dir):
    z = _z(spark, sf_dir)
    pts = z.select(
        (F.col("row") * GRID.cols + F.col("col")).alias("pid"), "row", "col"
    ).where(F.pmod(F.col("row") * GRID.cols + F.col("col"), F.lit(SIG_MOD)) == 0)
    out = an.max_anisotropy_dev_signature(pts, z, GRID, MIN_SCALE, MAX_SCALE, STEP)
    return out.select(
        "pid", F.col("scale").cast("int").alias("scale"),
        F.round("value", 6).alias("value"),
    )


QUERIES = {
    "max_anisotropy_dev": q_max_anisotropy_dev,
    "max_anisotropy_sig": q_max_anisotropy_sig,
}


# ------------------------------------------------------------- oracle SQL


def _pane_sql(kind: str, terms) -> str:
    parts = [
        f"({kind}{pa} + {kind}{pb} - {kind}{mc} - {kind}{md})"
        for pa, pb, mc, md in terms
    ]
    return " + ".join(parts)


def _scale_ctes(mid: int) -> str:
    mpr = (mid * 2 + 1) // 6
    joins = []
    sels = []
    for a in range(1, 5):
        for b in range(1, 5):
            al = f"g{a}{b}"
            joins.append(
                f"JOIN ig {al} ON {al}.grow = b.yc{a} AND {al}.gcol = b.xc{b}"
            )
            sels.append(
                f"{al}.i AS i{a}{b}, {al}.i2 AS q{a}{b}, {al}.i_n AS n{a}{b}"
            )
    dev_blocks = []
    for name, terms in [
        ("f", an._FULL), ("p1", an._NS), ("p2", an._EW),
        ("p3", an._NESW), ("p4", an._NWSE),
    ]:
        n = _pane_sql("n", terms)
        s = _pane_sql("i", terms)
        q = _pane_sql("q", terms)
        dev_blocks.append(
            f"CAST({n} AS BIGINT) AS n_{name}, {s} AS s_{name}, {q} AS q_{name}"
        )
    pane_dev = []
    for name in ("f", "p1", "p2", "p3", "p4"):
        pane_dev.append(f"""
      CASE WHEN n_{name} > 3
                AND (q_{name} - (s_{name} * s_{name}) / CAST(n_{name} AS DOUBLE))
                    / CAST(n_{name} AS DOUBLE) > 0.0
           THEN (z - s_{name} / CAST(n_{name} AS DOUBLE))
                / sqrt((q_{name} - (s_{name} * s_{name}) / CAST(n_{name} AS DOUBLE))
                       / CAST(n_{name} AS DOUBLE))
           END AS d_{name}""")
    return f"""base{mid} AS (
  SELECT r.cell_row AS row, r.cell_col AS col, r.value AS z,
         r.cell_row - {mid} - 1 AS yc1, r.cell_row - {mpr} - 1 AS yc2,
         r.cell_row + {mpr} AS yc3, r.cell_row + {mid} AS yc4,
         r.cell_col - {mid} - 1 AS xc1, r.cell_col - {mpr} - 1 AS xc2,
         r.cell_col + {mpr} AS xc3, r.cell_col + {mid} AS xc4
  FROM r
  WHERE r.cell_row - {mid} - 1 >= 0 AND r.cell_row + {mid} < {GRID.rows}
    AND r.cell_col - {mid} - 1 >= 0 AND r.cell_col + {mid} < {GRID.cols}),
cf{mid} AS (
  SELECT b.row, b.col, b.z, {', '.join(sels)}
  FROM base{mid} b
  {' '.join(joins)}),
dv{mid} AS (
  SELECT row, col, z, {', '.join(dev_blocks)}
  FROM cf{mid}),
pd{mid} AS (
  SELECT row, col, {', '.join(pane_dev)}
  FROM dv{mid}),
a{mid} AS (
  SELECT row, col,
         sqrt((coalesce(d_p1 - d_f, 0.0) * coalesce(d_p1 - d_f, 0.0)
             + coalesce(d_p2 - d_f, 0.0) * coalesce(d_p2 - d_f, 0.0)
             + coalesce(d_p3 - d_f, 0.0) * coalesce(d_p3 - d_f, 0.0)
             + coalesce(d_p4 - d_f, 0.0) * coalesce(d_p4 - d_f, 0.0))
           / ((CASE WHEN d_p1 IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN d_p2 IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN d_p3 IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN d_p4 IS NOT NULL THEN 1 ELSE 0 END))) AS value
  FROM pd{mid}
  WHERE d_f IS NOT NULL
    AND (d_p1 IS NOT NULL OR d_p2 IS NOT NULL OR d_p3 IS NOT NULL
         OR d_p4 IS NOT NULL))"""


_INTEGRAL_CTES = f"""dense AS (
  SELECT gr.i AS grow, gc.j AS gcol, r.value
  FROM range(0, {GRID.rows}) gr(i)
  CROSS JOIN range(0, {GRID.cols}) gc(j)
  LEFT JOIN r ON r.cell_row = gr.i AND r.cell_col = gc.j),
dd AS (SELECT grow, gcol,
              coalesce(value, 0.0) AS v,
              coalesce(value, 0.0) * coalesce(value, 0.0) AS v2,
              CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END AS vn
       FROM dense),
rc AS (SELECT grow, gcol,
              sum(v) OVER (PARTITION BY grow ORDER BY gcol
                           ROWS UNBOUNDED PRECEDING) AS rs,
              sum(v2) OVER (PARTITION BY grow ORDER BY gcol
                            ROWS UNBOUNDED PRECEDING) AS rs2,
              sum(vn) OVER (PARTITION BY grow ORDER BY gcol
                            ROWS UNBOUNDED PRECEDING) AS rsn
       FROM dd),
ig AS MATERIALIZED (SELECT grow, gcol,
              sum(rs) OVER (PARTITION BY gcol ORDER BY grow
                            ROWS UNBOUNDED PRECEDING) AS i,
              sum(rs2) OVER (PARTITION BY gcol ORDER BY grow
                             ROWS UNBOUNDED PRECEDING) AS i2,
              sum(rsn) OVER (PARTITION BY gcol ORDER BY grow
                             ROWS UNBOUNDED PRECEDING) AS i_n
       FROM rc)"""

_MIDS = [m for m in range(MIN_SCALE, MAX_SCALE + 1) if (m - MIN_SCALE) % STEP == 0]


def _mad_sql() -> str:
    scales = ",\n".join(_scale_ctes(m) for m in _MIDS)
    m1, m2 = _MIDS[0], _MIDS[-1]
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_INTEGRAL_CTES},
{scales}
SELECT coalesce(a.row, b.row) AS cell_row, coalesce(a.col, b.col) AS cell_col,
       round(CASE WHEN a.value IS NULL THEN b.value
                  WHEN b.value IS NOT NULL AND b.value * b.value > a.value * a.value
                  THEN b.value ELSE a.value END, 6) AS mag,
       CAST(CASE WHEN a.value IS NULL THEN {m2}
                 WHEN b.value IS NOT NULL AND b.value * b.value > a.value * a.value
                 THEN {m2} ELSE {m1} END AS INT) AS scale
FROM a{m1} a FULL JOIN a{m2} b ON b.row = a.row AND b.col = a.col"""


def _sig_sql() -> str:
    scales = ",\n".join(_scale_ctes(m) for m in _MIDS)
    sel = "\nUNION ALL\n".join(
        f"""SELECT r.cell_row * {GRID.cols} + r.cell_col AS pid,
       CAST({m} AS INT) AS scale, round(a.value, 6) AS value
FROM r JOIN a{m} a ON a.row = r.cell_row AND a.col = r.cell_col
WHERE (r.cell_row * {GRID.cols} + r.cell_col) % {SIG_MOD} = 0"""
        for m in _MIDS
    )
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_INTEGRAL_CTES},
{scales}
{sel}"""


ORACLE_SQL = {
    "max_anisotropy_dev": _mad_sql(),
    "max_anisotropy_sig": _sig_sql(),
}
