"""Interleaved docs synthesis + span invariant machinery."""

from pyspark.sql import functions as F

from whitebox_tools_spark.sources.docs import (
    check_span_equality,
    span_signature,
    synth_docs,
)
from whitebox_tools_spark import derive


def test_synth_shape(spark):
    docs = synth_docs(spark, 100)
    assert docs.count() == 100
    row = docs.where(F.col("doc_num") == 3).collect()[0]
    assert row["doc_id"] == "doc-000000000003"
    spans = row["spans"]
    assert 1 <= len(spans) <= 6
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets)
    for s in spans:
        if s["kind"] == "text":
            assert s["text"] is not None and s["media_ref"] is None
        else:
            assert s["media_ref"] is not None and s["text"] is None


def test_synth_deterministic(spark):
    a = synth_docs(spark, 50).select("doc_id", span_signature().alias("sig")).collect()
    b = synth_docs(spark, 50).select("doc_id", span_signature().alias("sig")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_span_equality_checker(spark):
    docs = synth_docs(spark, 80)
    # an engine-like pipeline: derive geometry, filter, shuffle — spans ride along
    out = (
        derive.with_geometry(docs, "doc_num")
        .where(F.col("x") < 800)
        .repartition(7, "doc_id")
    )
    assert check_span_equality(docs, out) == 0


def test_span_mutation_detected(spark):
    docs = synth_docs(spark, 30)
    # reverse spans (breaks order after signature's canonical sort? no — the
    # signature sorts by offset, so reversal is NOT a violation; mutate a
    # field instead)
    mutated = docs.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.concat(F.coalesce(s["text"], F.lit("")), F.lit("X")).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    assert check_span_equality(docs, mutated) == 30


def test_derivation_matches_numpy_and_duckdb(spark):
    import duckdb
    import numpy as np

    docs = synth_docs(spark, 200)
    got = (
        derive.with_geometry(docs, "doc_num")
        .select("doc_num", "x", "y", "z", "cls")
        .orderBy("doc_num")
        .collect()
    )
    ids = np.arange(200)
    nx = derive.np_coord(ids, "x")
    ny = derive.np_coord(ids, "y")
    nz = derive.np_coord(ids, "z")
    nc = derive.np_cls(ids)
    for r in got:
        i = r["doc_num"]
        assert r["x"] == nx[i] and r["y"] == ny[i] and r["z"] == nz[i]
        assert r["cls"] == nc[i]

    sql = (
        f"SELECT i AS doc_num, {derive.sql_geometry_select('i')} "
        "FROM generate_series(0, 199) t(i) ORDER BY 1"
    )
    duck = duckdb.sql(sql).fetchall()
    for (i, dx, dy, dz, dc), r in zip(duck, got):
        assert (dx, dy, dz, dc) == (r["x"], r["y"], r["z"], r["cls"])
