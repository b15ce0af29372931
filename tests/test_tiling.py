"""LidarTile parity: Spark pipeline vs numpy kernel on derived docs."""

import numpy as np
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.kernels.tile import surviving_tiles, tile_assign
from whitebox_tools_spark.operators.tiling import (
    assign_tiles,
    filter_populated,
    lidar_tile,
)
from whitebox_tools_spark.sources.docs import check_span_equality, synth_docs

PARAMS = dict(origin_x=0.0, origin_y=0.0, width=250.0, height=250.0)


def _numpy_tiles(n):
    ids = np.arange(n)
    x = derive.np_coord(ids, "x")
    y = derive.np_coord(ids, "y")
    tiles, cols, rows = tile_assign(x, y, 0.0, 0.0, 250.0, 250.0)
    return ids, tiles


def test_tile_assignment_parity(spark):
    n = 1000
    docs = derive.with_geometry(synth_docs(spark, n), "doc_num")
    got = {
        r["doc_num"]: r["tile"]
        for r in assign_tiles(docs, **PARAMS).select("doc_num", "tile").collect()
    }
    ids, tiles = _numpy_tiles(n)
    assert got == {int(i): int(t) for i, t in zip(ids, tiles)}


def test_population_filter_parity(spark):
    # tiny doc count + big tiles so some tiles are sparse
    n = 40
    docs = derive.with_geometry(synth_docs(spark, n), "doc_num")
    out = lidar_tile(docs, min_points=2, **PARAMS)
    got_ids = {r["doc_num"] for r in out.select("doc_num").collect()}

    ids, tiles = _numpy_tiles(n)
    keep = set(surviving_tiles(tiles, 2).tolist())
    expect = {int(i) for i, t in zip(ids, tiles) if int(t) in keep}
    assert got_ids == expect


def test_spans_preserved_through_tiling(spark):
    docs = synth_docs(spark, 300)
    out = lidar_tile(derive.with_geometry(docs, "doc_num"), min_points=2, **PARAMS)
    assert check_span_equality(docs, out) == 0


def test_boundary_docs_floor_semantics(spark):
    # docs positioned exactly on tile boundaries via explicit coordinates
    rows = [(0, 0.0, 0.0), (1, 250.0, 0.0), (2, 499.9999, 250.0), (3, 999.0, 999.0)]
    df = spark.createDataFrame(rows, "doc_num long, x double, y double")
    got = {
        r["doc_num"]: (r["tile_col"], r["tile_row"])
        for r in assign_tiles(df, **PARAMS).collect()
    }
    assert got == {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (3, 3)}
