"""Physical-plan guards: the plans we designed for are the plans Spark
actually picks. Catches regressions like a broadcast turning into a
shuffle join or a filter failing to reach the parquet scan."""

from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.operators import tiling
from whitebox_tools_spark.operators.pip import clip_points
from whitebox_tools_spark.operators.radius_join import radius_join
from whitebox_tools_spark.sources import vectors
from whitebox_tools_spark.sources.tables import documents

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _geo(spark):
    return derive.with_geometry(documents(spark, SF_DIR), "doc_id")


class TestPlans:
    def test_pip_clip_is_narrow(self, spark):
        """The broadcast-layer PIP join must be a NARROW map pass — zero
        shuffles over the document table."""
        plan = _plan(clip_points(_geo(spark), vectors.rect_layer(), "semi"))
        assert "Exchange" not in plan, plan

    def test_tile_population_filter_broadcasts_counts(self, spark):
        """The tiny per-tile count table must broadcast back onto the big
        side (BroadcastHashJoin, LeftSemi), never shuffle the doc table a
        second time."""
        df = tiling.lidar_tile(_geo(spark), min_points=2)
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan

    def test_radius_join_is_single_shuffle_equijoin(self, spark):
        """Cell-key radius join: the probe-side explode happens BEFORE the
        exchange and the join is a plain hash equi-join on the packed key."""
        geo = _geo(spark)
        pts = geo.select(F.col("doc_id").alias("pid"), "x", "y", "z")
        qs = geo.select(F.col("doc_id").alias("qid"), "x", "y")
        plan = _plan(radius_join(pts, qs, 25.0))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "Generate explode" in plan or "Generate" in plan  # 5x5 neighbour explode

    def test_projection_pushdown_reaches_scan(self, spark):
        """Column pruning: a 2-column projection must not read the whole
        documents schema."""
        df = documents(spark, SF_DIR).select("doc_id")
        plan = _plan(df)
        assert "ReadSchema: struct<doc_id:bigint>" in plan, plan

    def test_filter_pushdown_reaches_scan(self, spark):
        df = documents(spark, SF_DIR).where(F.col("doc_id") < 100).select("doc_id")
        plan = _plan(df)
        assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan, plan

    def test_bbox_joins_are_equijoins(self, spark):
        """The overlay / segment-intersection family must plan as hash
        equi-joins on the grid-cell key — never BroadcastNestedLoopJoin
        or CartesianProduct (the round-1 scale hazard)."""
        from whitebox_tools_spark.operators import cost as cop
        from whitebox_tools_spark.operators import vector_ops as vo
        from whitebox_tools_spark.sources import vectors

        la = spark.createDataFrame(vectors.layer_to_rows(vectors.rect_layer()))
        lb = spark.createDataFrame(vectors.layer_to_rows(vectors.rect_layer_b()))
        l1 = spark.createDataFrame(vectors.line_layer_rows(vectors.LINE_SPECS_1))
        l2 = spark.createDataFrame(vectors.line_layer_rows(vectors.LINE_SPECS_2))
        for df in (
            vo.polygon_overlay_areas(la, lb),
            cop.line_intersections(l1, l2),
            vo.split_with_lines(l1, l2),
        ):
            plan = _plan(df)
            assert "BroadcastNestedLoopJoin" not in plan, plan
            assert "CartesianProduct" not in plan, plan


class TestRound2Plans:
    def test_fixture_queries_scan_local_relations(self, spark):
        """Catalog fixture layers must plan as LocalTableScan (VALUES
        LocalRelation) — never a Python-RDD scan (applySchemaToPythonRDD:
        unknown stats, forced sort-merge joins, a Python worker per
        re-scan)."""
        from whitebox_tools_spark import catalog_overlay as co

        for name in ("polygon_overlay", "split_with_lines", "dissolve",
                     "dissolve_geom"):
            df = co.QUERIES[name](spark, "/root/testdata/sf0.001")
            plan = _plan(df)
            assert "applySchemaToPythonRDD" not in plan, (name, plan)
            assert "LocalTableScan" in plan, (name, plan)

    def test_lsh_pair_join_has_no_distinct_aggregate(self, spark):
        """minhash candidate pairs are emitted exactly once via the
        first-matching-band filter — the plan must contain exactly the
        band equi-join and no pair-dedup HashAggregate above it."""
        from whitebox_tools_spark.operators import text as tx
        from whitebox_tools_spark.sources.tables import documents

        docs = documents(spark, "/root/testdata/sf0.001")
        plan = _plan(tx.minhash_candidates(docs))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        # no aggregate at all: candidates flow straight out of the join
        assert "HashAggregate" not in plan, plan

    def test_viewshed_is_distributed_jvm(self, spark):
        """Round-3 scale guard: viewshed must not materialize the DEM on
        the driver (no Python eval nodes — the old mapInPandas kernel
        implied a driver-side DEM collect + broadcast) and the ray
        samples must reach the DEM via an equi-join."""
        from whitebox_tools_spark import api

        plan = _plan(api.QUERIES["viewshed"](spark, SF_DIR))
        for node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython",
                     "FlatMapGroupsInPandas"):
            assert node not in plan, node
        assert "HashJoin" in plan or "SortMergeJoin" in plan, plan

    def test_buffer_geometry_is_generate_only(self, spark):
        """Buffer outline: one Generate over per-part HOFs — no joins,
        no shuffle exchange."""
        from whitebox_tools_spark.localrel import local_df
        from whitebox_tools_spark.operators.misc6 import buffer_vector_geometry
        from whitebox_tools_spark.sources import vectors

        layer = local_df(spark, vectors.layer_to_rows(vectors.rect_layer()))
        plan = _plan(buffer_vector_geometry(layer, 30.0))
        assert "Join" not in plan, plan
        assert "Exchange" not in plan, plan


# Queries whose executed plan legitimately contains a
# BroadcastNestedLoopJoin, audited one by one (round-2 sweep): a 1-row
# global-aggregate crossJoin (scalar broadcast), an EDT site-lattice
# constructor (rows x target-columns, the documented working set), a
# brute-force ANN baseline (crossJoin by design), or a range predicate
# against an explicitly broadcast SMALL dimension (pour points, fixture
# lake/clip rectangles). Anything outside this list is an unreviewed
# theta-join — the round-1 scale hazard — and fails the sweep.
BNLJ_ALLOWED = {
    "geomorphons", "histogram_equalization", "ann_topk", "z_scores",
    "euclidean_distance", "euclidean_allocation", "elev_relative_to_min_max",
    "integral_image", "morans_i", "random_field", "snap_pour_points",
    "jenson_snap_pour_points", "tin_gridding", "shape_complexity_raster",
    "hypsometric_analysis", "slope_vs_elevation", "horizon_angle",
    "rgb_to_ihs", "ihs_to_rgb", "colour_composite", "split_colour_composite",
    "decorrelation_stretch", "balance_contrast", "buffer_raster",
    "fill_missing_data", "fetch_analysis", "directional_relief",
    "elev_above_stream_euclidean", "narrowness_index", "ks_normality",
    "histogram_matching", "multiscale_topographic_position", "flatten_lakes",
    "turning_bands", "lidar_classify_subset", "voronoi_raster",
    "mosaic_feathering", "stddev_stretch", "percentage_stretch",
    "symmetrical_difference_area", "rect_grid",
    # viewshed family: the DEM crossJoins an explicitly broadcast
    # viewpoint frame (a handful of rows) — the ray samples themselves
    # are an equi-join; audited round 3 when the driver-resident DEM
    # was replaced by this fully distributed pipeline.
    "viewshed", "visibility_index",
    # viewshed_sweep: same audited shape — the only non-equi join is the
    # DEM crossJoin against the explicitly broadcast <=3-row viewpoint
    # frame; blockers/targets meet in a window, not a join (round 4).
    "viewshed_sweep",
    # IVF ANN: corpus/queries crossJoin an explicitly broadcast 16-row
    # centroid frame (Lloyd assignment + probe ranking); the candidate
    # generation itself is the cluster-id equi-join — audited round 3.
    "ivf_topk",
    # rescale_value_range attaches a 1-row min/max aggregate to every
    # cell via an explicitly broadcast crossJoin (local_math.py:237-251)
    # — the same audited 1-row-stats-frame shape as stddev_stretch /
    # percentage_stretch; weighted_overlay composes it per factor
    # (round 4).
    "rescale_range", "weighted_overlay",
    # bm25_score crossJoins the explicitly broadcast 1-row global-stats
    # aggregate (N, avg dl, per-term df) onto the per-doc frame
    # (text.py bm25_scores) — the audited 1-row-stats-frame shape
    # (round 5).
    "bm25_score",
    # bigram_lm crossJoins the explicitly broadcast 1-row vocabulary
    # size aggregate onto the scored postings (text.py
    # bigram_lm_scores) — the same audited 1-row-stats-frame shape
    # (round 5).
    "bigram_lm",
    # ivfpq_topk probes via the same explicitly-broadcast 16-row
    # centroid crossJoin audited for ivf_topk; candidates and ADC are
    # equi-joins (round 5).
    "ivfpq_topk",
}


class TestCatalogPlanSweep:
    def test_no_cartesian_and_bnlj_only_where_audited(self, spark):
        """Explain-only sweep over the FULL catalog: no CartesianProduct
        anywhere; BroadcastNestedLoopJoin only in the audited allowlist."""
        from whitebox_tools_spark import api

        import re

        # expensive expressions that must never appear inside a parquet
        # scan's DataFilters: a Generate's inferred non-empty filter can
        # collapse a single-referenced array build into the scan,
        # recomputing it per row (measured 8x on the shingle lanes —
        # explode_outer on never-empty arrays is the fix)
        expensive = ("transform(", "array_distinct", "md5(", "aggregate(")

        offenders = []
        for name, fn in api.QUERIES.items():
            plan = _plan(fn(spark, SF_DIR))
            if "CartesianProduct" in plan:
                offenders.append((name, "CartesianProduct"))
            if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
                offenders.append((name, "BroadcastNestedLoopJoin"))
            for line in plan.splitlines():
                if "DataFilters" in line:
                    m = re.search(r"DataFilters: \[(.*?)\], Format", line)
                    expr = m.group(1) if m else ""
                    if any(k in expr for k in expensive):
                        offenders.append((name, "recompute-in-scan-filter"))
                        break
        assert not offenders, offenders
