"""TIN construction + gridding (SURVEY.md §2.2: TINGridding /
LidarTINGridding / ConstructVectorTIN / LidarConstructVectorTIN,
gis_analysis/tin_gridding.rs:349, algorithms/delaunay_triangulation.rs).

Delaunay is computed by its *relational definition* — a triangle of
input points is Delaunay iff its circumcircle strictly contains no other
point — vectorized in numpy inside one applyInPandas group per spatial
partition. The same definition is directly expressible in SQL, which is
what makes the DuckDB oracle exact (the reference's incremental
triangulator produces the same unique set for points in general
position). Brute force is O(n^3) per partition: right for the
bounded-size cell partitions the production path feeds it (points are
grouped by coarse grid cell with halo points, each cell triangulated
independently — the SURVEY §2.2 plan); do NOT feed it a monolithic
million-point partition.

Interpolation: for each output cell center inside a triangle, the linear
plane through the three vertices via barycentric coordinates; the
expression shape is kept identical in Spark and SQL so floats match
bit-for-bit. Cells on shared edges match both triangles with the same
interpolated value; the smallest (id1,id2,id3) wins for row uniqueness.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.operators.gridding import GridConfig, cell_centers

_TRI_SCHEMA = T.StructType(
    [
        T.StructField("id1", T.LongType()),
        T.StructField("id2", T.LongType()),
        T.StructField("id3", T.LongType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("z1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
        T.StructField("z2", T.DoubleType()),
        T.StructField("x3", T.DoubleType()),
        T.StructField("y3", T.DoubleType()),
        T.StructField("z3", T.DoubleType()),
    ]
)


def _delaunay_np(ids, xs, ys, zs, chunk=20000):
    """All Delaunay triangles by the empty-circumcircle definition.
    Vertices emitted in ascending-id order."""
    n = len(ids)
    order = np.argsort(ids)
    ids, xs, ys, zs = ids[order], xs[order], ys[order], zs[order]
    ii, jj, kk = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")
    m = (ii < jj) & (jj < kk)
    ti, tj, tk = ii[m], jj[m], kk[m]
    out = []
    for s in range(0, len(ti), chunk):
        a, b, c = ti[s : s + chunk], tj[s : s + chunk], tk[s : s + chunk]
        ax, ay = xs[a], ys[a]
        bx, by = xs[b], ys[b]
        cx, cy = xs[c], ys[c]
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ok = d != 0.0
        with np.errstate(invalid="ignore", divide="ignore"):
            a2 = ax * ax + ay * ay
            b2 = bx * bx + by * by
            c2 = cx * cx + cy * cy
            ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
            uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
            r2 = (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)
            # any OTHER point strictly inside the circumcircle?
            dx = xs[None, :] - ux[:, None]
            dy = ys[None, :] - uy[:, None]
            inside = (dx * dx + dy * dy) < r2[:, None]
        inside[np.arange(len(a)), a] = False
        inside[np.arange(len(a)), b] = False
        inside[np.arange(len(a)), c] = False
        keep = ok & ~inside.any(axis=1)
        for i in np.nonzero(keep)[0]:
            out.append(
                (
                    int(ids[a[i]]), int(ids[b[i]]), int(ids[c[i]]),
                    xs[a[i]], ys[a[i]], zs[a[i]],
                    xs[b[i]], ys[b[i]], zs[b[i]],
                    xs[c[i]], ys[c[i]], zs[c[i]],
                )
            )
    return out


def construct_tin(
    points: DataFrame, record: str = "doc_id", partition_col: str | None = None
) -> DataFrame:
    """ConstructVectorTIN: triangle table from a point table. Points are
    triangulated per ``partition_col`` group (one global group when
    None — only for bounded point counts)."""
    pts = points.select(
        F.col(record).alias("pid"),
        "x",
        "y",
        "z",
        (F.lit(0) if partition_col is None else F.col(partition_col)).alias("part"),
    )

    names = [f.name for f in _TRI_SCHEMA.fields]

    def tri_group(pdf: pd.DataFrame) -> pd.DataFrame:
        tris = _delaunay_np(
            pdf["pid"].to_numpy(np.int64),
            pdf["x"].to_numpy(np.float64),
            pdf["y"].to_numpy(np.float64),
            pdf["z"].to_numpy(np.float64),
        )
        if not tris:
            return pd.DataFrame(
                {n: pd.Series(dtype="int64" if n.startswith("id") else "float64") for n in names}
            )
        return pd.DataFrame(tris, columns=names)

    return pts.groupBy("part").applyInPandas(tri_group, schema=_TRI_SCHEMA)


def tin_gridding(points: DataFrame, cfg: GridConfig, record: str = "doc_id") -> DataFrame:
    """TINGridding (tin_gridding.rs:349): linear-plane interpolation of
    each cell center inside a Delaunay triangle; NoData outside the hull."""
    tris = construct_tin(points, record)
    cells = cell_centers(points.sparkSession, cfg)
    # zero-area slivers (exactly-collinear lattice points that survive the
    # circumcircle test) carry no interpolable surface — drop them before
    # the barycentric division (ANSI div-by-zero; DuckDB would yield inf)
    ndeg = (F.col("x2") - F.col("x1")) * (F.col("y3") - F.col("y1")) - (
        F.col("x3") - F.col("x1")
    ) * (F.col("y2") - F.col("y1"))
    j = cells.join(
        F.broadcast(tris.where(ndeg != 0.0)),
        (F.col("x") >= F.least("x1", "x2", "x3"))
        & (F.col("x") <= F.greatest("x1", "x2", "x3"))
        & (F.col("y") >= F.least("y1", "y2", "y3"))
        & (F.col("y") <= F.greatest("y1", "y2", "y3")),
    )
    det = (F.col("x2") - F.col("x1")) * (F.col("y3") - F.col("y1")) - (
        F.col("x3") - F.col("x1")
    ) * (F.col("y2") - F.col("y1"))
    l2 = (
        (F.col("x") - F.col("x1")) * (F.col("y3") - F.col("y1"))
        - (F.col("x3") - F.col("x1")) * (F.col("y") - F.col("y1"))
    ) / det
    l3 = (
        (F.col("x2") - F.col("x1")) * (F.col("y") - F.col("y1"))
        - (F.col("x") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    ) / det
    val = F.col("z1") + l2 * (F.col("z2") - F.col("z1")) + l3 * (
        F.col("z3") - F.col("z1")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("row", "col").orderBy("id1", "id2", "id3")
    return (
        j.withColumn("l2", l2)
        .withColumn("l3", l3)
        .where(
            (F.col("l2") >= 0.0) & (F.col("l3") >= 0.0) & (F.col("l2") + F.col("l3") <= 1.0)
        )
        .withColumn("value", val)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("row", "col", "value")
    )
