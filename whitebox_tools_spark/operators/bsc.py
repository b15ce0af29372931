"""BoundaryShapeComplexity (gis_analysis/boundary_shape_complexity.rs).

Reference pipeline (:200-520): binarize (>0), line-thin to a skeleton,
then per polygon-value bin walk every "exterior link" (chain from an
end node — a skeleton cell with exactly one same-poly skeleton
neighbour — to the first junction / chain end), and report

    index = 100 * (sum(1 + link_length) - longest - 2nd longest)
                / (# skeleton cells of the bin)

painted back onto every input cell of that value (0 stays 0).

The reference's link walk is a sequential scan with a shared `visited`
raster (:415-450); its outcomes are fully determined by row-major scan
order, which makes it re-expressible relationally:

- the skeleton's degree<=2 subgraph decomposes into paths/cycles
  (connected components — pointer-doubling);
- a path with two degree-1 ends is walked end-to-end by its row-major
  FIRST end (link = n), the other end then contributes a length-1 link;
- a path with one degree-1 end terminates at exactly one junction
  (degree>=3 cell); the walk enters and "visits" the junction only if
  no earlier-ordered walk reached that junction first — a rank-1 test
  over (poly, junction) ordered by origin cell id;
- cycles and junction-to-junction chains are never walked.

Deviations (documented): the skeleton comes from the engine's
synchronous line_thinning (operators/morpho.py) rather than the
reference's in-place scan, and missing input cells are read as
background 0 (the reference propagates nodata).  The bin-0 quirk is
replicated exactly: the reference normalizes bins 1..n only, so a
polygon whose value equals the raster minimum reports the raw
end-node sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.graph import connected_components
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY
from whitebox_tools_spark.operators.morpho import line_thinning

NAN = float("nan")


def boundary_shape_complexity(
    poly: DataFrame,
    cfg: GridConfig,
    tile_size: int = 128,
    thin_rounds: int = 20,
) -> DataFrame:
    """poly: full-coverage (row, col, value>=0), 0 = background."""
    b = poly.select(
        "row", "col",
        F.when(F.col("value") > 0.0, 1.0).otherwise(0.0).alias("value"),
    )
    sk = line_thinning(b, cfg, max_rounds=thin_rounds, tile_size=tile_size)
    cid = (F.col("row") * cfg.cols + F.col("col")).alias("id")
    cells = (
        sk.where(F.col("value") > 0.0)
        .select("row", "col")
        .join(poly.select("row", "col", F.col("value").alias("poly")), ["row", "col"])
        .select(cid, "row", "col", "poly")
        .localCheckpoint(eager=True)
    )
    probes = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dx, dy in zip(D8_DX, D8_DY)
        ]
    )
    edges = (
        cells.select(
            F.col("id").alias("a"), "poly", F.explode(probes).alias("o"),
            (F.col("row") + F.col("o.dy")).alias("nr"),
            (F.col("col") + F.col("o.dx")).alias("nc"),
        )
        .join(
            cells.select(
                F.col("id").alias("b"), F.col("row").alias("nr"),
                F.col("col").alias("nc"), F.col("poly").alias("bpoly"),
            ),
            ["nr", "nc"],
        )
        .where(F.col("poly") == F.col("bpoly"))
        .select("a", "b", "poly")
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(F.col("a").alias("id")).agg(F.count("b").alias("deg"))
    cd = cells.join(deg, "id", "left").fillna(0, ["deg"])

    s_nodes = cd.where(F.col("deg") <= 2).select("id", "poly", "deg")
    degb = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    s_edges = (
        edges.join(s_nodes.select(F.col("id").alias("a")), "a")
        .join(degb, "b")
        .where(F.col("deg_b") <= 2)
        .select("a", "b")
    )
    comp = connected_components(s_edges, s_nodes.select("id"))

    cstat = (
        comp.join(s_nodes, F.col("node") == F.col("id"))
        .groupBy("comp")
        .agg(
            F.count("*").alias("n"),
            F.first("poly").alias("poly"),
            F.sum(F.when(F.col("deg") == 1, 1).otherwise(0)).alias("d1_cnt"),
            F.min(F.when(F.col("deg") == 1, F.col("id"))).alias("d1_min"),
            F.max(F.when(F.col("deg") == 1, F.col("id"))).alias("d1_max"),
        )
    )
    # the unique junction edge of a one-ended path (see module doc)
    jedge = (
        edges.join(comp.select(F.col("node").alias("a"), "comp"), "a")
        .join(degb, "b")
        .where(F.col("deg_b") >= 3)
        .select("comp", F.col("b").alias("junction"))
    )

    case_a = cstat.where(F.col("d1_cnt") == 2)
    walks_a = case_a.select(
        "poly", F.col("d1_min").alias("origin"),
        F.col("n").alias("link"), (F.col("n") + 1).alias("contrib"),
    ).unionByName(
        case_a.select(
            "poly", F.col("d1_max").alias("origin"),
            F.lit(1).cast("long").alias("link"), F.lit(2).cast("long").alias("contrib"),
        )
    )
    wj = Window.partitionBy("poly", "junction").orderBy("d1_min")
    walks_b = (
        cstat.where(F.col("d1_cnt") == 1)
        .join(jedge, "comp")
        .withColumn("enter", F.when(F.row_number().over(wj) == 1, 1).otherwise(0))
        .select(
            "poly", F.col("d1_min").alias("origin"),
            (F.col("n") + F.col("enter")).alias("link"),
            (F.col("n") + F.col("enter") + 1).alias("contrib"),
        )
    )
    walks = walks_a.unionByName(walks_b)

    wl = Window.partitionBy("poly").orderBy(F.col("link").desc(), "origin")
    per_poly = (
        walks.withColumn("rn", F.row_number().over(wl))
        .groupBy("poly")
        .agg(
            F.sum("contrib").alias("ne"),
            F.sum(F.when(F.col("rn") <= 2, F.col("link")).otherwise(0)).alias("top2"),
        )
    )
    n_skel = cells.groupBy("poly").agg(F.count("*").alias("num_cells"))
    minv = poly.agg(F.min("value")).collect()[0][0]
    stats = (
        n_skel.join(per_poly, "poly", "left")
        .fillna(0, ["ne", "top2"])
        .select(
            "poly",
            F.when(
                F.floor(F.col("poly") - F.lit(minv)) >= 1,
                F.lit(100.0) * (F.col("ne") - F.col("top2")) / F.col("num_cells"),
            )
            .otherwise(F.col("ne").cast("double"))
            .alias("idx"),
        )
    )
    return poly.join(
        stats.withColumnRenamed("poly", "value"), "value", "left"
    ).select(
        "row", "col",
        F.when(F.col("value") == 0.0, 0.0)
        .otherwise(F.coalesce("idx", F.lit(NAN)))
        .alias("value"),
    )
