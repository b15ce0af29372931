"""Query catalog: LiDAR neighbourhood family over the derived point
table. Spark uses the FRS cell join; the oracles use the plain
quadratic pair join (identical pair sets — the cell join only prunes
beyond-radius candidates)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import _PTS_CTE
from whitebox_tools_spark.operators import lidar as ld
from whitebox_tools_spark.sources.tables import documents

RADIUS = 100.0
ELEV_DIFF = 40.0
OVERLAP_RES = 250.0
SEG_ANGLE = 15.0


def _geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def _cc_normals(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.normals(spark, sf_dir, RADIUS)


def _cc_pairs(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.pairs3d(spark, sf_dir, RADIUS)


QUERIES = {
    "lidar_remove_outliers": lambda s, d: ld.lidar_remove_outliers(
        _geo(s, d), RADIUS, ELEV_DIFF).select("doc_id", "x", "y", "z"),
    "lidar_tophat": lambda s, d: ld.lidar_tophat(_geo(s, d), RADIUS).select(
        "doc_id", F.round("tophat", 6).alias("tophat")),
    "normal_vectors": lambda s, d: _cc_normals(s, d).select(
        "doc_id", F.round("nx", 6).alias("nx"), F.round("ny", 6).alias("ny"),
        F.round("nz", 6).alias("nz")),
    "classify_overlap_points": lambda s, d: ld.classify_overlap_points(
        _geo(s, d), OVERLAP_RES).select("doc_id", "overlap"),
    "lidar_segmentation": lambda s, d: ld.lidar_segmentation(
        _geo(s, d), RADIUS, SEG_ANGLE, nv=_cc_normals(s, d), pairs=_cc_pairs(s, d)
    ).select("doc_id", "segment"),
}


# ------------------------------------------------------------- oracle SQL

_R2 = RADIUS * RADIUS

_PAIRS = f"""pr AS MATERIALIZED (
  SELECT q.doc_id, q.x, q.y, q.z, p.doc_id AS pid, p.x AS xp, p.y AS yp, p.z AS zp,
         (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) AS d2
  FROM pts q JOIN pts p
    ON (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) <= {_R2!r})"""

_NORMAL_CTES = f"""{_PAIRS},
p3 AS (SELECT * FROM pr WHERE d2 + (z - zp) * (z - zp) <= {_R2!r}),
mom AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
               sum(xp) AS sx, sum(yp) AS sy, sum(zp) AS sz,
               sum(xp * xp) AS sxx, sum(xp * yp) AS sxy, sum(xp * zp) AS sxz,
               sum(yp * yp) AS syy, sum(yp * zp) AS syz, sum(zp * zp) AS szz
        FROM p3 GROUP BY doc_id),
cv AS (SELECT doc_id, n,
              sxx - sx * sx / n AS xx, sxy - sx * sy / n AS xy, sxz - sx * sz / n AS xz,
              syy - sy * sy / n AS yy, syz - sy * sz / n AS yz, szz - sz * sz / n AS zz
       FROM mom),
dets AS (SELECT *, yy * zz - yz * yz AS det_x, xx * zz - xz * xz AS det_y,
                xx * yy - xy * xy AS det_z,
                greatest(yy * zz - yz * yz, xx * zz - xz * xz, xx * yy - xy * xy) AS det_max
         FROM cv),
vecs AS (SELECT doc_id, n,
  CASE WHEN det_max = det_x THEN 1.0
       WHEN det_max = det_y THEN (yz * xz - xy * zz) / det_y
       ELSE (yz * xy - xz * yy) / det_z END AS vx,
  CASE WHEN det_max = det_x THEN (xz * yz - xy * zz) / det_x
       WHEN det_max = det_y THEN 1.0
       ELSE (xz * xy - yz * xx) / det_z END AS vy,
  CASE WHEN det_max = det_x THEN (xy * yz - xz * yy) / det_x
       WHEN det_max = det_y THEN (xy * xz - yz * xx) / det_y
       ELSE 1.0 END AS vz
  FROM dets),
nrm AS (SELECT doc_id, n, vx, vy, vz,
               sqrt(vx * vx + vy * vy + vz * vz) AS nn FROM vecs),
normals AS (SELECT v.doc_id,
       CASE WHEN v.n >= 3 AND d.det_max > 1.0 THEN v.vx / v.nn ELSE 0.0 END AS nx,
       CASE WHEN v.n >= 3 AND d.det_max > 1.0 THEN v.vy / v.nn ELSE 0.0 END AS ny,
       CASE WHEN v.n >= 3 AND d.det_max > 1.0 THEN v.vz / v.nn ELSE 0.0 END AS nz
FROM nrm v JOIN dets d ON d.doc_id = v.doc_id)"""

ORACLE_SQL = {
    "lidar_remove_outliers": f"""WITH {_PTS_CTE},
{_PAIRS},
nb AS (SELECT doc_id, sum(zp) / count(*) AS avg_z FROM pr WHERE d2 <> 0.0 GROUP BY doc_id),
r AS (SELECT p.doc_id, p.x, p.y, p.z,
             CASE WHEN nb.avg_z IS NOT NULL THEN p.z - nb.avg_z ELSE p.z END AS resid
      FROM pts p LEFT JOIN nb ON nb.doc_id = p.doc_id)
SELECT doc_id, x, y, z FROM r WHERE abs(resid) <= {ELEV_DIFF!r}""",
    "lidar_tophat": f"""WITH {_PTS_CTE},
{_PAIRS},
ero AS MATERIALIZED (SELECT doc_id, x, y, z, min(zp) AS ero FROM pr
       GROUP BY doc_id, x, y, z),
dil AS (SELECT a.doc_id, a.z, max(b.ero) AS dil
        FROM ero a JOIN ero b
          ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_R2!r}
        GROUP BY a.doc_id, a.z)
SELECT doc_id, round(z - dil, 6) AS tophat FROM dil""",
    "normal_vectors": f"""WITH {_PTS_CTE},
{_NORMAL_CTES}
SELECT doc_id, round(nx, 6) AS nx, round(ny, 6) AS ny, round(nz, 6) AS nz
FROM normals""",
    "classify_overlap_points": f"""WITH {_PTS_CTE},
fl AS (SELECT doc_id, x, y,
              ((doc_id * {ld.PSID_A} + {ld.PSID_B}) % {ld._M32}) % {ld.PSID_MOD} AS psid,
              CAST((doc_id * {ld.T_A} + {ld.T_B}) % {ld._M32} AS DOUBLE) / {float(ld._M32)!r} * 3600.0 AS gps_time
       FROM pts),
cells AS (SELECT doc_id, psid, gps_time,
                 CAST(floor(x / {OVERLAP_RES!r}) AS BIGINT) AS ci,
                 CAST(floor(y / {OVERLAP_RES!r}) AS BIGINT) AS cj
          FROM fl),
per AS (SELECT ci, cj, psid, min(gps_time) AS t0 FROM cells GROUP BY ci, cj, psid),
prim AS (SELECT ci, cj, psid AS prim FROM per
         QUALIFY row_number() OVER (PARTITION BY ci, cj ORDER BY t0 ASC, psid ASC) = 1)
SELECT c.doc_id,
       CASE WHEN c.psid = p.prim THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS overlap
FROM cells c JOIN prim p ON p.ci = c.ci AND p.cj = c.cj""",
    "lidar_segmentation": f"""WITH RECURSIVE {_PTS_CTE},
{_NORMAL_CTES},
pn AS MATERIALIZED (SELECT p.doc_id, p.x, p.y, p.z, n.nx, n.ny, n.nz
      FROM pts p JOIN normals n ON n.doc_id = p.doc_id),
ed AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM pn a JOIN pn b
    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       + (a.z - b.z) * (a.z - b.z) <= {_R2!r}
   AND NOT ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) = 0.0)
   AND abs(a.nx * b.nx + a.ny * b.ny + a.nz * b.nz) >= {math.cos(math.radians(SEG_ANGLE))!r}),
sym AS (SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed),
cc AS (SELECT doc_id AS node, doc_id AS lbl FROM pts
       UNION
       SELECT s.b, cc.lbl FROM cc JOIN sym s ON s.a = cc.node),
comp AS (SELECT node, min(lbl) AS comp FROM cc GROUP BY node),
ranked AS (SELECT comp, CAST(row_number() OVER (ORDER BY comp) AS DOUBLE) AS seg
           FROM (SELECT DISTINCT comp FROM comp))
SELECT c.node AS doc_id, r.seg AS segment
FROM comp c JOIN ranked r ON r.comp = c.comp""",
}


# ---------------------------------------------------- lidar ransac planes

RS_RADIUS = 100.0
RS_ITER = 8
RS_SAMPLES = 5
RS_THRESHOLD = 5.0
RS_MODEL = 10


def q_lidar_ransac_planes(spark, sf_dir):
    from whitebox_tools_spark.operators.ransac import lidar_ransac_planes

    return lidar_ransac_planes(
        _geo(spark, sf_dir), RS_RADIUS, RS_ITER, RS_SAMPLES, RS_THRESHOLD, RS_MODEL
    ).select("doc_id", "planar")


QUERIES["lidar_ransac_planes"] = q_lidar_ransac_planes


def _ransac_sql() -> str:
    r2 = RS_RADIUS * RS_RADIUS
    res0 = "(e.zp - (-(p0.d + p0.a * e.xp + p0.b * e.yp) / p0.c))"
    resr = "(i.zp - (-(r.rd + r.ra * i.xp + r.rb * i.yp) / r.rc))"
    fit = """{src} AS (SELECT doc_id, t,
       CASE WHEN det_max = det_x THEN 1.0
            WHEN det_max = det_y THEN (yz * xz - xy * zz) / det_y
            ELSE (yz * xy - xz * yy) / det_z END AS {p}a,
       CASE WHEN det_max = det_x THEN (xz * yz - xy * zz) / det_x
            WHEN det_max = det_y THEN 1.0
            ELSE (xz * xy - yz * xx) / det_z END AS {p}b,
       CASE WHEN det_max = det_x THEN (xy * yz - xz * yy) / det_x
            WHEN det_max = det_y THEN (xy * xz - yz * xx) / det_y
            ELSE 1.0 END AS {p}c,
       cx, cy, cz
  FROM (SELECT *, greatest(det_x, det_y, det_z) AS det_max
        FROM (SELECT doc_id, t, sx / n AS cx, sy / n AS cy, sz / n AS cz,
                     yy * zz - yz * yz AS det_x, xx * zz - xz * xz AS det_y,
                     xx * yy - xy * xy AS det_z, xx, xy, xz, yy, yz, zz
              FROM (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS n,
                           sum(xp) AS sx, sum(yp) AS sy, sum(zp) AS sz,
                           sum(xp * xp) AS sxx, sum(xp * yp) AS sxy,
                           sum(xp * zp) AS sxz, sum(yp * yp) AS syy,
                           sum(yp * zp) AS syz, sum(zp * zp) AS szz
                    FROM {rows} GROUP BY doc_id, t {having}) m0
              CROSS JOIN LATERAL (SELECT sxx - sx * sx / n AS xx,
                     sxy - sx * sy / n AS xy, sxz - sx * sz / n AS xz,
                     syy - sy * sy / n AS yy, syz - sy * sz / n AS yz,
                     szz - sz * sz / n AS zz) cvx) dts) fx)"""
    fit0 = fit.format(src="fitx0", p="", rows="samples", having="")
    fitr = fit.format(src="fitxr", p="r", rows="inl i", having=f"HAVING count(*) >= {RS_MODEL}")
    return f"""WITH {_PTS_CTE},
pr AS MATERIALIZED (
  SELECT q.doc_id, q.x, q.y, q.z, p.doc_id AS pid, p.x AS xp, p.y AS yp, p.z AS zp,
         (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) AS d2
  FROM pts q JOIN pts p
    ON (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) <= {r2!r}),
p3 AS MATERIALIZED (SELECT * FROM pr WHERE d2 + (z - zp) * (z - zp) <= {r2!r}),
cnt AS (SELECT doc_id, count(*) AS nn FROM p3 GROUP BY doc_id),
el AS MATERIALIZED (SELECT p3.* FROM p3
  JOIN cnt ON cnt.doc_id = p3.doc_id WHERE cnt.nn > {RS_SAMPLES}),
ex AS (SELECT e.*, t.t,
       CAST(('0x' || substr(md5(e.doc_id || ':' || e.pid || ':' || t.t), 1, 15)) AS BIGINT) AS h
  FROM el e CROSS JOIN range(0, {RS_ITER}) t(t)),
samples AS (SELECT * FROM ex
  QUALIFY row_number() OVER (PARTITION BY doc_id, t ORDER BY h, pid) <= {RS_SAMPLES}),
{fit0},
plane0 AS (SELECT doc_id, t, a, b, c, -a * cx + -b * cy + -c * cz AS d FROM fitx0),
inl AS MATERIALIZED (SELECT e.doc_id, p0.t, e.xp, e.yp, e.zp
  FROM el e JOIN plane0 p0 ON p0.doc_id = e.doc_id
  WHERE abs({res0}) <= {RS_THRESHOLD!r}),
{fitr},
refit AS (SELECT doc_id, t, ra, rb, rc, -ra * cx + -rb * cy + -rc * cz AS rd FROM fitxr),
rms AS (SELECT i.doc_id, i.t, r.ra, r.rb, r.rc, r.rd,
       sqrt(sum({resr} * {resr}) / count(*)) AS rmse
  FROM inl i JOIN refit r ON r.doc_id = i.doc_id AND r.t = i.t
  GROUP BY i.doc_id, i.t, r.ra, r.rb, r.rc, r.rd),
best AS (SELECT doc_id, ra, rb, rc, rd, rmse FROM rms
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY round(rmse, 9), t) = 1)
SELECT p.doc_id,
       CASE WHEN b.ra IS NOT NULL AND NOT isnan(b.rmse)
                 AND (p.z - (-(b.rd + b.ra * p.x + b.rb * p.y) / b.rc))
                     <= {RS_THRESHOLD!r}
            THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS planar
FROM pts p LEFT JOIN best b ON b.doc_id = p.doc_id"""


ORACLE_SQL["lidar_ransac_planes"] = _ransac_sql()
