"""Per-feature geometry measures (SURVEY.md §2.4) as JVM-side expressions.

All measures run over the relational polygon form (fid, part, is_hole,
xs: array<double>, ys: array<double>) with Spark higher-order functions —
no Python in the loop, so they scale to any layer size and have exact SQL
oracles.

Parity contracts:
- polygon_area (src/algorithms/poly_area.rs:12-25): shoelace incl. the
  wraparound term, abs/2 (works for open or closed rings — closed rings'
  wraparound term is 0).
- polygon_perimeter (src/algorithms/poly_perimeter.rs:12-24): consecutive
  edge lengths + closing edge.
- CompactnessRatio (gis_analysis/compactness_ratio.rs:199-222): per record
  A/P where A = sum(shell part areas) - sum(hole part areas), P = sum of
  all part perimeters, each part passed WITHOUT its closing vertex
  (Rust slice points[start..end] excludes the end index).
- PerimeterAreaRatio (perimeter_area_ratio.rs): P/A, same accumulations.
- CentroidVector point mode n/a; polygon/line mode (centroid_vector.rs:
  252-265): plain vertex mean over ALL of a record's points (closing
  duplicates included!).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _open_ring(col: str) -> Column:
    """Drop the closing vertex (reference slices parts without the end
    index: compactness_ratio.rs:211)."""
    return F.slice(F.col(col), 1, F.size(F.col(col)) - 1)


def part_area(xs: Column, ys: Column) -> Column:
    """Shoelace |sum(x_i*y_{i+1} - x_{i+1}*y_i)| / 2 with wraparound."""
    n = F.size(xs)
    idx = F.sequence(F.lit(0), n - 2)
    body = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at(xs, i + 1) * F.element_at(ys, i + 2)
            - F.element_at(xs, i + 2) * F.element_at(ys, i + 1)
        ),
    )
    wrap = F.element_at(xs, n) * F.element_at(ys, 1) - F.element_at(xs, 1) * F.element_at(
        ys, n
    )
    return F.abs(body + wrap) / F.lit(2.0)


def part_perimeter(xs: Column, ys: Column) -> Column:
    """Sum of consecutive edge lengths + the closing edge."""
    n = F.size(xs)
    idx = F.sequence(F.lit(0), n - 2)

    def d(i_from: Column, i_to: Column) -> Column:
        dx = F.element_at(xs, i_to) - F.element_at(xs, i_from)
        dy = F.element_at(ys, i_to) - F.element_at(ys, i_from)
        return F.sqrt(dx * dx + dy * dy)

    body = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + d(i + 1, i + 2))
    return body + d(n, F.lit(1))


def with_part_measures(layer: DataFrame) -> DataFrame:
    """Adds area / perimeter per part (closing vertex stripped first)."""
    xs, ys = _open_ring("xs"), _open_ring("ys")
    return layer.withColumn("area", part_area(xs, ys)).withColumn(
        "perimeter", part_perimeter(xs, ys)
    )


def compactness_ratio(layer: DataFrame) -> DataFrame:
    """Per-record A/P (holes subtract from A, all parts add to P)."""
    m = with_part_measures(layer)
    g = m.groupBy("fid").agg(
        F.sum(
            F.when(F.col("is_hole"), -F.col("area")).otherwise(F.col("area"))
        ).alias("area"),
        F.sum("perimeter").alias("perimeter"),
    )
    return g.withColumn("compactness", F.col("area") / F.col("perimeter"))


def perimeter_area_ratio(layer: DataFrame) -> DataFrame:
    return compactness_ratio(layer).withColumn(
        "p_a_ratio", F.col("perimeter") / F.col("area")
    )


def centroid_vector(layer_points: DataFrame, record: str = "fid") -> DataFrame:
    """CentroidVector: vertex mean per record (centroid_vector.rs:252-265).
    ``layer_points`` = exploded vertices (fid, x, y), closing duplicates
    included as in the reference's record.points."""
    return layer_points.groupBy(record).agg(
        F.avg("x").alias("x"), F.avg("y").alias("y")
    )


# ------------------------------------------------------------- SQL oracles


def part_area_sql(xs: str = "xs", ys: str = "ys") -> str:
    """DuckDB expression mirroring part_area over OPEN rings (1-indexed
    lists; caller strips the closing vertex with list_slice)."""
    return (
        f"abs(list_sum(list_transform(range(1, len({xs})), "
        f"i -> {xs}[i] * {ys}[i + 1] - {xs}[i + 1] * {ys}[i])) "
        f"+ ({xs}[len({xs})] * {ys}[1] - {xs}[1] * {ys}[len({ys})])) / 2.0"
    )


def part_perimeter_sql(xs: str = "xs", ys: str = "ys") -> str:
    return (
        f"list_sum(list_transform(range(1, len({xs})), "
        f"i -> sqrt(({xs}[i + 1] - {xs}[i]) * ({xs}[i + 1] - {xs}[i]) "
        f"+ ({ys}[i + 1] - {ys}[i]) * ({ys}[i + 1] - {ys}[i])))) "
        f"+ sqrt(({xs}[1] - {xs}[len({xs})]) * ({xs}[1] - {xs}[len({xs})]) "
        f"+ ({ys}[1] - {ys}[len({ys})]) * ({ys}[1] - {ys}[len({ys})]))"
    )
