"""Radius & kNN join parity vs the FRS numpy oracle (incl. the reference's
own pinned constellation, fixed_radius_search.rs:468-559)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.kernels.frs import frs_knn_search, frs_radius_search
from whitebox_tools_spark.operators.radius_join import knn_join, radius_join

FRS_PTS = [
    (1, 40.0, 32.0),
    (2, 25.0, 65.0),
    (3, 42.0, 35.0),
    (4, 40.0, 31.0),
    (5, 24.0, 68.0),
]


@pytest.fixture(scope="module")
def frs_points(spark):
    return spark.createDataFrame(FRS_PTS, "pid long, x double, y double")


def test_radius_join_reference_constellation(spark, frs_points):
    q = spark.createDataFrame([(0, 40.5, 31.5)], "qid long, x double, y double")
    got = radius_join(frs_points, q, 0.75).select("pid_p", "dist").collect()
    assert sorted((r["pid_p"], round(r["dist"], 12)) for r in got) == [
        (1, round(0.7071067811865476, 12)),
        (4, round(0.7071067811865476, 12)),
    ]


def test_knn_join_reference_constellation(spark, frs_points):
    q = spark.createDataFrame([(0, 40.5, 31.5)], "qid long, x double, y double")
    got = knn_join(frs_points, q, k=3, radius=0.75).select("pid_p", "dist").collect()
    assert sorted((r["pid_p"], round(r["dist"], 12)) for r in got) == sorted(
        [
            (4, round(0.7071067811865476, 12)),
            (1, round(0.7071067811865476, 12)),
            (3, round(3.8078865529319543, 12)),
        ]
    )


def test_radius_join_parity_random(spark):
    n_pts, n_q, radius = 300, 40, 60.0
    ids = np.arange(n_pts)
    px, py = derive.np_coord(ids, "x"), derive.np_coord(ids, "y")
    qids = np.arange(n_q) + 10_000
    qx, qy = derive.np_coord(qids, "x"), derive.np_coord(qids, "y")

    pts = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, a, b in zip(ids, px, py)],
        "pid long, x double, y double",
    )
    qs = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, a, b in zip(qids, qx, qy)],
        "qid long, x double, y double",
    )
    got = radius_join(pts, qs, radius).select("qid", "pid_p", "dist").collect()
    got_set = {(r["qid"], r["pid_p"], round(r["dist"], 9)) for r in got}

    expect = set()
    for qi, qqx, qqy in zip(qids, qx, qy):
        for v, d in frs_radius_search(px, py, ids, qqx, qqy, radius):
            expect.add((int(qi), int(v), round(d, 9)))
    assert got_set == expect
    assert len(expect) > 50  # fixture dense enough to be meaningful


def test_knn_join_parity_random(spark):
    n_pts, n_q, k, radius = 200, 25, 5, 30.0
    ids = np.arange(n_pts)
    px, py = derive.np_coord(ids, "x"), derive.np_coord(ids, "y")
    qids = np.arange(n_q) + 50_000
    qx, qy = derive.np_coord(qids, "x"), derive.np_coord(qids, "y")

    pts = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, a, b in zip(ids, px, py)],
        "pid long, x double, y double",
    )
    qs = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, a, b in zip(qids, qx, qy)],
        "qid long, x double, y double",
    )
    got = knn_join(pts, qs, k=k, radius=radius).select("qid", "pid_p", "dist").collect()

    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["pid_p"], round(r["dist"], 9)))

    for qi, qqx, qqy in zip(qids, qx, qy):
        expect = frs_knn_search(px, py, ids, qqx, qqy, k, radius)
        exp = sorted((int(v), round(d, 9)) for v, d in expect)
        assert sorted(by_q.get(int(qi), [])) == exp, int(qi)


def test_knn_k_exceeds_population(spark, frs_points):
    q = spark.createDataFrame([(0, 40.5, 31.5)], "qid long, x double, y double")
    got = knn_join(frs_points, q, k=50, radius=0.75).collect()
    assert len(got) == 5


class TestSalting:
    def test_two_stage_salted_agg_equals_plain(self, spark):
        """Hot-key two-stage aggregation (group on (key, salt), then merge
        by key) must equal the direct groupBy — exactness of the skew path."""
        from pyspark.sql import functions as F

        from whitebox_tools_spark.operators.cells import with_salt

        # one very hot key (0) + a long tail
        df = spark.range(20000).select(
            F.col("id"),
            F.when(F.col("id") % 4 != 0, 0).otherwise(F.col("id") % 97).alias("key"),
            (F.col("id") % 13).cast("double").alias("v"),
        )
        salted = with_salt(df, "id", n_salt=8)
        partial = salted.groupBy("key", "salt").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
        )
        merged = partial.groupBy("key").agg(
            F.sum("s").alias("sum_v"), F.sum("c").alias("n")
        )
        direct = df.groupBy("key").agg(
            F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n")
        )
        assert merged.exceptAll(direct).count() == 0
        assert direct.exceptAll(merged).count() == 0

    def test_salted_join_equals_plain(self, spark):
        from pyspark.sql import functions as F

        from whitebox_tools_spark.operators.cells import explode_salt, with_salt

        big = spark.range(10000).select(
            F.col("id"), (F.col("id") % 7).alias("key"), (F.col("id") * 2).alias("v")
        )
        dim = spark.range(7).select(
            F.col("id").alias("key"), (F.col("id") * 10).alias("w")
        )
        plain = big.join(dim, "key").select("id", "v", "w")
        salted = (
            with_salt(big, "id", n_salt=4)
            .join(explode_salt(dim, n_salt=4), ["key", "salt"])
            .select("id", "v", "w")
        )
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0


def test_knn_join_loop_fallback_via_histogram_guard(spark):
    """max_hist_cells below the occupancy must route to the loop strategy
    (single-scan LIMIT sentinel, VERDICT r3 item 5) and still return the
    same neighbours as the stats path."""
    n_pts, n_q, k, radius = 120, 10, 4, 30.0
    ids = np.arange(n_pts)
    px, py = derive.np_coord(ids, "x"), derive.np_coord(ids, "y")
    qids = np.arange(n_q) + 70_000
    qx, qy = derive.np_coord(qids, "x"), derive.np_coord(qids, "y")
    pts = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, a, b in zip(ids, px, py)],
        "pid long, x double, y double",
    )
    qs = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, a, b in zip(qids, qx, qy)],
        "qid long, x double, y double",
    )
    stats = knn_join(pts, qs, k=k, radius=radius).select(
        "qid", "pid_p", "dist").collect()
    looped = knn_join(pts, qs, k=k, radius=radius, max_hist_cells=1).select(
        "qid", "pid_p", "dist").collect()
    canon = lambda rows: sorted(
        (r["qid"], r["pid_p"], round(r["dist"], 9)) for r in rows)
    assert canon(looped) == canon(stats)


def test_cell_histogram_sentinel():
    from whitebox_tools_spark.operators.radius_join import _cell_histogram
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    pts = spark.createDataFrame(
        [(float(i * 100), 0.0) for i in range(8)], "x double, y double")
    # 8 points in 8 distinct cells at radius 30
    assert _cell_histogram(pts, 30.0, "x", "y", max_cells=4) is None
    h = _cell_histogram(pts, 30.0, "x", "y", max_cells=100)
    assert sum(h.values()) == 8 and len(h) == 8


def test_knn_loop_reaches_far_queries(spark):
    """A query far outside the point extent must still find its k
    nearest in the loop strategy (shells are bounded by the COMBINED
    point+query extent, not the point extent alone)."""
    from whitebox_tools_spark.operators.radius_join import knn_join

    pts = spark.createDataFrame(
        [(float(i), float(i % 3)) for i in range(8)], "x double, y double")
    far_q = spark.createDataFrame([(1, 500.0, 500.0)],
                                  "qid long, x double, y double")
    out = knn_join(pts, far_q, k=2, radius=2.0, strategy="loop").toPandas()
    assert len(out) == 2
    assert set(out["knn_rank"]) == {1, 2}


def test_knn_loop_fallback_cap(spark):
    """The loop strategy's never-filled-query fallback is a remaining ×
    points product; above max_fallback_pairs it must raise with a clear
    message instead of silently going quadratic (ADVICE r4 #4)."""
    import pytest as _pytest
    from whitebox_tools_spark.operators.radius_join import knn_join

    pts = spark.createDataFrame(
        [(float(i), float(i % 3)) for i in range(8)], "x double, y double")
    far_q = spark.createDataFrame([(1, 500.0, 500.0), (2, 600.0, 610.0)],
                                  "qid long, x double, y double")
    with _pytest.raises(ValueError, match="max_fallback_pairs"):
        knn_join(pts, far_q, k=2, radius=2.0, strategy="loop",
                 max_fallback_pairs=8).count()
    # generous cap still succeeds
    out = knn_join(pts, far_q, k=2, radius=2.0, strategy="loop",
                   max_fallback_pairs=100).toPandas()
    assert len(out) == 4
