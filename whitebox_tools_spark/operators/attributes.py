"""Attribute-table (relational) operators (SURVEY.md §2.3).

Parity contracts:
- JoinTables (src/tools/data_tools/join_tables.rs:78-114): hash equi-join,
  one-to-one / many-to-one ONLY — the lookup side is keyed uniquely; we
  broadcast it (the reference builds a HashMap of the whole file).
- MergeTableWithCsv (data_tools/merge_table_with_csv.rs): same join, CSV
  right side (spark.read.csv upstream).
- MergeVectors (data_tools/merge_vectors.rs): UNION ALL with union of
  attribute schemas (missing fields null).
- AddPointCoordinatesToTable (data_tools/add_point_coordinates_to_table.rs)
- ReinitializeAttributeTable (data_tools/reinitialize_attribute_table.rs)
- ExportTableToCsv (data_tools/export_table_to_csv.rs)
- ListUniqueValues (math_stat_analysis/list_unique_values.rs): distinct
  values + counts.
- AttributeCorrelation (math_stat_analysis/attribute_correlation.rs):
  Pearson r for every pair of numeric attribute columns.
- LidarRemoveDuplicates (lidar_analysis/remove_duplicates.rs): exact
  (x, y[, z]) dedupe keeping the FIRST record in file order.
- EliminateCoincidentPoints (gis_analysis/eliminate_coincident_points.rs:
  245-265): record-order greedy — point i is dropped iff a KEPT point
  j < i lies strictly within ``tolerance``. Sequential by nature; we make
  it distributed by building the within-tolerance pair graph (one radius
  join), labelling its connected components (tiny local clusters) and
  replaying the greedy inside each component — exact, and parallel over
  components.
"""

from __future__ import annotations

from itertools import combinations
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.operators.radius_join import radius_join


def join_tables(
    left: DataFrame, lookup: DataFrame, pkey: str, fkey: str, import_fields: list[str]
) -> DataFrame:
    """JoinTables: left join importing ``import_fields`` from the broadcast
    lookup side (many-to-one; lookup key assumed unique, as the reference's
    HashMap silently keeps one row per key — enforce with a distinct)."""
    lk = lookup.select(fkey, *import_fields).dropDuplicates([fkey])
    return left.join(F.broadcast(lk), left[pkey] == lk[fkey], "left").drop(lk[fkey])


def merge_vectors(layers: list[DataFrame]) -> DataFrame:
    """MergeVectors: UNION ALL with schema union (missing fields null)."""
    out = layers[0]
    for df in layers[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def list_unique_values(df: DataFrame, field: str) -> DataFrame:
    return df.groupBy(field).agg(F.count(F.lit(1)).alias("n"))


def attribute_correlation(df: DataFrame, fields: list[str]) -> DataFrame:
    """Pearson r for each field pair, one aggregate pass (corr is
    map-side combinable)."""
    aggs = [
        F.corr(a, b).alias(f"{a}__{b}") for a, b in combinations(fields, 2)
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{a}', '{b}', {a}__{b}" for a, b in combinations(fields, 2)
    )
    n = len(list(combinations(fields, 2)))
    return wide.selectExpr(
        f"stack({n}, {stack}) AS (field_a, field_b, r)"
    )


def remove_duplicates(
    points: DataFrame, record: str = "doc_id", x: str = "x", y: str = "y"
) -> DataFrame:
    """LidarRemoveDuplicates: exact-coordinate dedupe keeping the first
    record in file order (min record id)."""
    from pyspark.sql import Window

    w = Window.partitionBy(x, y).orderBy(record)
    return (
        points.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def eliminate_coincident_points(
    points: DataFrame,
    tolerance: float,
    record: str = "doc_id",
    x: str = "x",
    y: str = "y",
    max_rounds: int = 50,
) -> DataFrame:
    """Exact EliminateCoincidentPoints (record-order greedy MIS over the
    strict-within-tolerance graph).

    Plan: (1) radius self-join -> pair edges (d < tolerance, one shuffle);
    (2) shared pointer-jumping connected components (operators/graph.py);
    (3) per-component greedy replay in Arrow batches. Points with no
    neighbour skip stages 2-3 entirely.
    """
    pts = points.select(record, x, y)
    # squared=True keeps the strict d^2 < tol^2 comparison on d2 itself,
    # exactly as eliminate_coincident_points.rs:257 (SquaredEuclidean FRS)
    pairs = radius_join(pts, pts.select(
        F.col(record).alias("qid"), F.col(x), F.col(y)
    ), tolerance, squared=True).where(
        (F.col("dist") < F.lit(tolerance * tolerance))
        & (F.col("qid") != F.col(f"{record}_p"))
    ).select(F.col("qid").alias("a"), F.col(f"{record}_p").alias("b"))

    # connected components by the shared pointer-jumping machinery
    # (O(log diameter) batched rounds + size-gated broadcasts) — the
    # label semantics (comp = min member id) match the previous inline
    # min-label fixpoint exactly
    from whitebox_tools_spark.operators.graph import connected_components

    touched = pairs.select("a").distinct()
    labels = connected_components(pairs, touched, "a", max_rounds=max_rounds)

    clustered = points.join(
        labels.withColumnRenamed("node", record), record, "inner"
    )
    loners = points.join(labels.withColumnRenamed("node", record), record, "left_anti")

    schema = points.schema

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(record).reset_index(drop=True)
        px = pdf[x].to_numpy(dtype=np.float64)
        py = pdf[y].to_numpy(dtype=np.float64)
        tol2 = tolerance * tolerance
        kept_idx: list[int] = []
        for i in range(len(pdf)):
            d2 = (px[i] - px[kept_idx]) ** 2 + (py[i] - py[kept_idx]) ** 2 if kept_idx else np.array([])
            if len(d2) == 0 or not (d2 < tol2).any():
                kept_idx.append(i)
        return pdf.iloc[kept_idx].drop(columns=["comp"])

    kept = clustered.groupBy("comp").applyInPandas(
        replay, schema=T.StructType(schema.fields)
    )
    return loners.unionByName(kept)
