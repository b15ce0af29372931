"""Grid-partitioned bbox equi-join — the engine's rectangle/segment
spatial-join primitive (PBSM / partition-based spatial merge join).

Replaces range-predicate theta-joins (which Catalyst can only plan as
BroadcastNestedLoopJoin / CartesianProduct — O(n*m) pairs, a scale
killer) with:

    1. each side's bbox is exploded to the grid cells it covers
       (single Generate over a JVM-built key array, no Python);
    2. one hash EQUI-join on the packed cell key (AQE skew-split safe);
    3. the bbox-overlap test as a post-filter;
    4. duplicate elimination WITHOUT a distinct shuffle: a pair is
       reported only in the cell containing the min corner of the two
       bboxes' intersection (that cell is covered by both bboxes, so
       every qualifying pair is emitted exactly once).

Reference contract: the candidate sets equal the reference's R-tree /
bbox prefilters (gis_analysis/intersect.rs:27-44 bbox test,
line_intersections.rs segment bbox test); the grid is only a physical
pruning strategy, invisible in the output.

Cell sizing: pass ``cell`` explicitly at scale (rule of thumb: the
median bbox diagonal). ``cell=None`` derives it from a one-row scalar
agg over the smaller input (mean bbox extent, clamped positive) —
fine for interactive use, deterministic for the oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.cells import pack_cell

BBOX_A = ("axmin", "aymin", "axmax", "aymax")
BBOX_B = ("bxmin", "bymin", "bxmax", "bymax")


def cover_cells(
    df: DataFrame,
    cell: float,
    bbox: tuple[str, str, str, str],
    out: str = "jcell",
) -> DataFrame:
    """Explode each row to the packed keys of every grid cell its bbox
    covers. One Generate node: the 2-D key array is flattened JVM-side."""
    inv = 1.0 / cell
    xmin, ymin, xmax, ymax = bbox
    ci0 = F.floor(F.col(xmin) * F.lit(inv)).cast("long")
    ci1 = F.floor(F.col(xmax) * F.lit(inv)).cast("long")
    cj0 = F.floor(F.col(ymin) * F.lit(inv)).cast("long")
    cj1 = F.floor(F.col(ymax) * F.lit(inv)).cast("long")
    keys = F.flatten(
        F.transform(
            F.sequence(ci0, ci1),
            lambda i: F.transform(F.sequence(cj0, cj1), lambda j: pack_cell(i, j)),
        )
    )
    return df.withColumn(out, F.explode(keys))


def _derive_cell(df: DataFrame, bbox: tuple[str, str, str, str]) -> float:
    xmin, ymin, xmax, ymax = bbox
    r = df.agg(
        F.mean(F.col(xmax) - F.col(xmin)).alias("w"),
        F.mean(F.col(ymax) - F.col(ymin)).alias("h"),
    ).first()
    w = float(r["w"] or 0.0)
    h = float(r["h"] or 0.0)
    return max(w, h, 1e-9)


def bbox_join(
    a: DataFrame,
    b: DataFrame,
    cell: float | None = None,
    a_bbox: tuple[str, str, str, str] = BBOX_A,
    b_bbox: tuple[str, str, str, str] = BBOX_B,
) -> DataFrame:
    """All (row_a, row_b) pairs whose bboxes overlap (closed intervals),
    each pair exactly once, via a grid-cell hash equi-join.

    Output: all columns of ``a`` then all columns of ``b`` (names must
    not collide; bbox columns stay available for downstream filters).
    """
    if cell is None:
        cell = _derive_cell(b, b_bbox)
    ea = cover_cells(a, cell, a_bbox, out="jcell")
    eb = cover_cells(b, cell, b_bbox, out="jcell")
    axmin, aymin, axmax, aymax = (F.col(c) for c in a_bbox)
    bxmin, bymin, bxmax, bymax = (F.col(c) for c in b_bbox)
    overlap = (
        (axmin <= bxmax) & (axmax >= bxmin) & (aymin <= bymax) & (aymax >= bymin)
    )
    inv = 1.0 / cell
    icell = pack_cell(
        F.floor(F.greatest(axmin, bxmin) * F.lit(inv)).cast("long"),
        F.floor(F.greatest(aymin, bymin) * F.lit(inv)).cast("long"),
    )
    return (
        ea.join(eb, "jcell")
        .where(overlap & (F.col("jcell") == icell))
        .drop("jcell")
    )


def segment_bbox(
    df: DataFrame,
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
    prefix: str = "a",
) -> DataFrame:
    """Add (``{p}xmin`` ...) bbox columns for endpoint-form segments."""
    return (
        df.withColumn(f"{prefix}xmin", F.least(x1, x2))
        .withColumn(f"{prefix}xmax", F.greatest(x1, x2))
        .withColumn(f"{prefix}ymin", F.least(y1, y2))
        .withColumn(f"{prefix}ymax", F.greatest(y1, y2))
    )
