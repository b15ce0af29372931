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

from whitebox_tools_spark.operators.graph import checkpoint_nostats, size_hint
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.localrel import local_df


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

    small = cfg.rows * cfg.cols <= 2_000_000

    def step(order):
        up = down.join(size_hint(order, small), down.a == order.id).select("b", "ord")
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
        return (
            nodes.select("id")
            .join(size_hint(new_ord_in, small), "id", "left")
            .select("id", F.coalesce(F.col("in_ord"), F.lit(1)).alias("ord"))
        )

    order = nodes.select("id", F.lit(1).alias("ord"))
    batch = 2  # two lazy rounds per checkpoint + convergence check
    for _ in range(max(1, (max_rounds + batch - 1) // batch)):
        new_order = order
        for _ in range(batch):
            new_order = step(new_order)
        new_order = new_order.transform(checkpoint_nostats)
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


def dem_grid(dem: DataFrame, cfg: GridConfig) -> np.ndarray:
    """Dense numpy grid from the JVM-aggregated per-row artifact: the
    long-form cell frame is compacted to ONE packed array row per DEM
    row (JVM-side sort+collect_list), so the driver transfer is
    cfg.rows rows, never a per-cell collect."""
    packed = (
        dem.groupBy("row")
        .agg(F.sort_array(F.collect_list(F.struct("col", "value"))).alias("cells"))
        .collect()
    )
    grid = np.full((cfg.rows, cfg.cols), np.nan)
    for r in packed:
        cols = [c["col"] for c in r["cells"]]
        grid[r["row"], cols] = [c["value"] for c in r["cells"]]
    return grid


def _viewshed_ring_sweep(
    g: np.ndarray, vr: int, vc: int, z0: float
) -> np.ndarray:
    """Visibility grid for one viewpoint: every Chebyshev ring k is
    evaluated as one (m_cells x k-1) vectorized batch — same sampled-ray
    arithmetic as the SQL oracle (floor(x+0.5) resampling, max block
    angle vs target angle), no per-cell Python loop."""
    nr, nc = g.shape
    rr, cc = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    n_steps = np.maximum(np.abs(rr - vr), np.abs(cc - vc))
    vis = np.where(np.isnan(g), np.nan, 1.0)
    kmax = int(n_steps.max())
    for k in range(2, kmax + 1):
        mask = (n_steps == k) & ~np.isnan(g)
        if not mask.any():
            continue
        r_t = rr[mask]
        c_t = cc[mask]
        ts = np.arange(1, k) / k
        rs = vr + np.multiply.outer(r_t - vr, ts)
        cs = vc + np.multiply.outer(c_t - vc, ts)
        ri = np.clip(np.floor(rs + 0.5).astype(int), 0, nr - 1)
        ci = np.clip(np.floor(cs + 0.5).astype(int), 0, nc - 1)
        path_z = g[ri, ci]
        target_angle = (g[r_t, c_t] - z0) / k
        block = (path_z - z0) / (k * ts)
        valid = ~np.isnan(block)
        bmax = np.where(
            valid.any(axis=1), np.nanmax(np.where(valid, block, -np.inf), axis=1), -np.inf
        )
        hidden = bmax > target_angle + 1e-12
        vis[r_t[hidden], c_t[hidden]] = 0.0
    return vis


def viewshed(
    dem: DataFrame,
    cfg: GridConfig,
    viewpoints: list[tuple[int, int]],
    station_height: float = 2.0,
) -> DataFrame:
    """Visible (1.0) / hidden (0.0) per cell per viewpoint. Each viewpoint
    is independent: the DEM broadcasts (from the per-row aggregated
    artifact, see dem_grid), viewpoints parallelize; each viewpoint's
    sweep is ring-vectorized numpy (no per-cell Python loop)."""
    grid = dem_grid(dem, cfg)
    spark = dem.sparkSession
    bc = spark.sparkContext.broadcast(grid)

    vp_df = local_df(
        spark,
        [(i, int(r), int(c)) for i, (r, c) in enumerate(viewpoints)],
        columns=["vp", "vr", "vc"],
    ).selectExpr("CAST(vp AS INT) AS vp", "vr", "vc")
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
        for pdf in batches:
            for vp, vr, vc in zip(pdf["vp"], pdf["vr"], pdf["vc"]):
                if np.isnan(g[vr, vc]):
                    continue
                vis = _viewshed_ring_sweep(g, int(vr), int(vc), g[vr, vc] + station_height)
                ok = ~np.isnan(vis)
                r_i, c_i = np.nonzero(ok)
                yield pd.DataFrame(
                    {
                        "vp": np.full(len(r_i), int(vp), dtype=np.int32),
                        "row": r_i.astype(np.int64),
                        "col": c_i.astype(np.int64),
                        "value": vis[ok],
                    }
                )

    return vp_df.mapInPandas(run, schema=schema)


def modified_kmeans(
    df: DataFrame,
    features: list[str],
    k0: int,
    merge_dist: float,
    record: str = "doc_id",
    max_iter: int = 20,
) -> tuple[DataFrame, list]:
    """ModifiedKMeansClustering (image_analysis/modified_k_means.rs,
    engine form): Lloyd's iterations starting from k0 centers, but after
    every update each cluster is RELABELLED to the smallest cluster id
    whose (live) center lies within ``merge_dist`` — one merge pass per
    iteration, no transitive chaining — and merged-away centers go dead.
    Deterministic: init = first k0 rows by ``record``, centers rounded to
    6 dp per round (see kmeans)."""
    first = df.orderBy(record).limit(k0).select(*features).collect()
    centers = {i: [float(v) for v in row] for i, row in enumerate(first)}

    def assign_expr(cs: dict):
        best_d = None
        best_i = None
        for i in sorted(cs):
            c = cs[i]
            d = None
            for f, cv in zip(features, c):
                t = (F.col(f) - F.lit(cv)) * (F.col(f) - F.lit(cv))
                d = t if d is None else d + t
            if best_d is None:
                best_d, best_i = d, F.lit(i)
            else:
                better = d < best_d
                best_i = F.when(better, F.lit(i)).otherwise(best_i)
                best_d = F.when(better, d).otherwise(best_d)
        return best_i

    assigned = None
    for _ in range(max_iter):
        assigned = df.select(record, *features, assign_expr(centers).alias("cluster"))
        upd = assigned.groupBy("cluster").agg(
            *[F.avg(f).alias(f) for f in features]
        ).collect()
        new_centers = dict(centers)
        for r in upd:
            new_centers[r["cluster"]] = [round(float(r[f]), 6) for f in features]
        # one merge pass: cluster i -> min j <= i with |c_i - c_j| < merge_dist
        remap = {}
        ids = sorted(new_centers)
        for i in ids:
            tgt = i
            for j in ids:
                if j >= i:
                    break
                d2 = sum(
                    (a - b) * (a - b)
                    for a, b in zip(new_centers[i], new_centers[j])
                )
                if d2 < merge_dist * merge_dist:
                    tgt = j
                    break
            remap[i] = tgt
        merged = {remap[i]: new_centers[remap[i]] for i in ids}
        if merged == centers:
            centers = merged
            break
        centers = merged
    assigned = df.select(record, *features, assign_expr(centers).alias("cluster"))
    return assigned.select(record, "cluster"), centers
