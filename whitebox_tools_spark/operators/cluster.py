"""Iterative clustering + stream ordering + line-of-sight (the remaining
data-dependent iterative families of SURVEY.md §2.7/§2.8).

- kmeans: Lloyd's algorithm (KMeansClustering / ModifiedKMeansClustering,
  image_analysis/k_means_clustering.rs) as a driver-bounded loop: centers
  broadcast, assignment is a codegen argmin expression, update is one
  map-side-combinable groupBy. Deterministic init = first k rows by id.
- strahler_order (stream_network_analysis/strahler_stream_order.rs):
  over the stream-cell flow DAG — heads are order 1; a cell's order is
  the max upstream order, +1 when >= 2 upstream links share that max.
  Frontier iteration, converges in stream-DAG depth rounds.
- viewshed (terrain_analysis/viewshed.rs): per-viewpoint line-of-sight;
  viewpoints are independent (embarrassingly parallel) — each viewpoint's
  LOS test runs as a numpy kernel over the broadcast DEM.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.operators.gridding import GridConfig


def kmeans(
    df: DataFrame,
    features: list[str],
    k: int,
    record: str = "doc_id",
    max_iter: int = 20,
) -> tuple[DataFrame, list[list[float]]]:
    """Returns (assignments DataFrame (record, cluster), final centers).

    Centers init = the first k rows ordered by ``record`` (deterministic);
    each iteration: one broadcast argmin projection + one groupBy.
    """
    first = df.orderBy(record).limit(k).select(*features).collect()
    centers = [[float(v) for v in row] for row in first]

    def assign_expr(cs):
        best_d = None
        best_i = None
        for i, c in enumerate(cs):
            d = None
            for f, cv in zip(features, c):
                t = (F.col(f) - F.lit(cv)) * (F.col(f) - F.lit(cv))
                d = t if d is None else d + t
            if best_d is None:
                best_d, best_i = d, F.lit(0)
            else:
                better = d < best_d
                best_i = F.when(better, F.lit(i)).otherwise(best_i)
                best_d = F.when(better, d).otherwise(best_d)
        return best_i

    assigned = None
    for _ in range(max_iter):
        assigned = df.select(record, *features, assign_expr(centers).alias("cluster"))
        upd = assigned.groupBy("cluster").agg(
            *[F.avg(f).alias(f) for f in features], F.count(F.lit(1)).alias("_n")
        ).collect()
        new_centers = list(centers)
        for r in upd:
            # round to 6 dp: makes centers invariant to partition-order float
            # accumulation, so assignments are deterministic across cluster sizes
            new_centers[r["cluster"]] = [round(float(r[f]), 6) for f in features]
        if new_centers == centers:
            break
        centers = new_centers
    return assigned.select(record, "cluster"), centers


def strahler_order(
    streams: DataFrame, dirs: DataFrame, cfg: GridConfig, max_rounds: int = 100
) -> DataFrame:
    """Strahler order over stream cells (value == 1 in ``streams``),
    using a D8 direction-index raster (row, col, dir)."""
    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY

    s = streams.where(F.col("value") == 1.0).select("row", "col")
    cells = s.join(dirs, ["row", "col"], "inner")
    dx = F.array(*[F.lit(v) for v in D8_DX])
    dy = F.array(*[F.lit(v) for v in D8_DY])
    cid = (F.col("row") * cfg.cols + F.col("col")).alias("id")
    nodes = cells.select("row", "col", cid, "dir")
    down_all = nodes.where(F.col("dir") >= 0).select(
        F.col("id").alias("a"),
        (
            (F.col("row") + F.element_at(dy, F.col("dir") + 1)) * cfg.cols
            + (F.col("col") + F.element_at(dx, F.col("dir") + 1))
        ).alias("b"),
    )
    # stream-to-stream edges only
    ids = nodes.select(F.col("id").alias("b"))
    down = down_all.join(ids, "b", "left_semi").localCheckpoint(eager=True)

    order = nodes.select("id", F.lit(1).alias("ord"))
    for _ in range(max_rounds):
        up = down.join(order, down.a == order.id).select("b", "ord")
        agg = up.groupBy("b", "ord").agg(F.count(F.lit(1)).alias("cnt"))
        # per junction: order at the max upstream link, +1 on a tie —
        # max(struct(ord, cnt)) picks the cnt belonging to the max ord
        # (ord is unique per b after the groupBy), no self-join needed.
        new_ord_in = agg.groupBy("b").agg(
            F.max(F.struct(F.col("ord"), F.col("cnt"))).alias("m")
        ).select(
            F.col("b").alias("id"),
            F.when(F.col("m.cnt") >= 2, F.col("m.ord") + 1)
            .otherwise(F.col("m.ord"))
            .alias("in_ord"),
        )
        new_order = (
            nodes.select("id")
            .join(new_ord_in, "id", "left")
            .select("id", F.coalesce(F.col("in_ord"), F.lit(1)).alias("ord"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_order.alias("n")
            .join(order.alias("o"), "id")
            .where(F.col("n.ord") != F.col("o.ord"))
            .limit(1)
            .count()
        )
        order = new_order
        if changed == 0:
            break
    return nodes.join(order, "id").select(
        "row", "col", F.col("ord").cast("double").alias("value")
    )


def viewshed(
    dem: DataFrame,
    cfg: GridConfig,
    viewpoints: list[tuple[int, int]],
    station_height: float = 2.0,
) -> DataFrame:
    """Visible (1.0) / hidden (0.0) per cell per viewpoint. Each viewpoint
    is independent: the DEM broadcasts, viewpoints parallelize."""
    rows = dem.collect()
    grid = np.full((cfg.rows, cfg.cols), np.nan)
    for r in rows:
        grid[r["row"], r["col"]] = r["value"]
    spark = dem.sparkSession
    bc = spark.sparkContext.broadcast(grid)

    vp_df = spark.createDataFrame(
        [(i, int(r), int(c)) for i, (r, c) in enumerate(viewpoints)],
        "vp int, vr long, vc long",
    )
    schema = T.StructType(
        [
            T.StructField("vp", T.IntegerType()),
            T.StructField("row", T.LongType()),
            T.StructField("col", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = bc.value
        nr, nc = g.shape
        for pdf in batches:
            out = []
            for vp, vr, vc in zip(pdf["vp"], pdf["vr"], pdf["vc"]):
                if np.isnan(g[vr, vc]):
                    continue
                z0 = g[vr, vc] + station_height
                for r in range(nr):
                    for c in range(nc):
                        if np.isnan(g[r, c]):
                            continue
                        n_steps = max(abs(r - vr), abs(c - vc))
                        visible = 1.0
                        if n_steps > 1:
                            ts = np.arange(1, n_steps) / n_steps
                            rs = vr + (r - vr) * ts
                            cs = vc + (c - vc) * ts
                            # floor(x+0.5) (round-half-up) — same arithmetic is
                            # expressible in ANSI SQL, unlike np.round's half-even
                            ri = np.clip(np.floor(rs + 0.5).astype(int), 0, nr - 1)
                            ci = np.clip(np.floor(cs + 0.5).astype(int), 0, nc - 1)
                            path_z = g[ri, ci]
                            target_angle = (g[r, c] - z0) / (n_steps)
                            block_angles = (path_z - z0) / (n_steps * ts)
                            valid = ~np.isnan(block_angles)
                            if valid.any() and (
                                block_angles[valid].max() > target_angle + 1e-12
                            ):
                                visible = 0.0
                        out.append((int(vp), int(r), int(c), visible))
            if out:
                yield pd.DataFrame(out, columns=["vp", "row", "col", "value"])

    return vp_df.mapInPandas(run, schema=schema)
