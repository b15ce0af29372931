"""Unit tests for the round-4 stack/positional/CDF local_math helpers
(the oracle rows in catalog_stack.py pin full values; these pin the
semantic corners: tie handling, null propagation, bin edges)."""

from pyspark.sql import functions as F

from whitebox_tools_spark.operators import local_math as lm


def _r(spark, rows):
    return spark.createDataFrame(rows, "row long, col long, value double")


def test_highest_lowest_position_first_wins_ties(spark):
    a = _r(spark, [(0, 0, 5.0)])
    b = _r(spark, [(0, 0, 5.0)])
    c = _r(spark, [(0, 0, 5.0)])
    hi = lm.highest_position([a, b, c]).collect()[0]
    lo = lm.lowest_position([a, b, c]).collect()[0]
    assert hi.value == 1.0 and lo.value == 1.0


def test_positions_pick_strict_extreme(spark):
    a = _r(spark, [(0, 0, 1.0)])
    b = _r(spark, [(0, 0, 9.0)])
    c = _r(spark, [(0, 0, 4.0)])
    assert lm.highest_position([a, b, c]).collect()[0].value == 2.0
    assert lm.lowest_position([a, b, c]).collect()[0].value == 1.0


def test_cume_dist_tie_stable(spark):
    # four cells, values 1,2,2,3 -> CDF 0.25, 0.75, 0.75, 1.0 (ties share)
    r = _r(spark, [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 2.0), (1, 1, 3.0)])
    got = {(x.row, x.col): x.value for x in lm.cumulative_distribution(r).collect()}
    assert got == {(0, 0): 0.25, (0, 1): 0.75, (1, 0): 0.75, (1, 1): 1.0}


def test_quantiles_ties_share_bins(spark):
    r = _r(spark, [(0, i, float(v)) for i, v in enumerate([1, 1, 1, 1, 9, 9, 9, 9])])
    got = sorted(x.value for x in lm.quantiles(r, 2).collect())
    assert got == [1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0]


def test_percent_stack_and_count_if(spark):
    a = _r(spark, [(0, 0, 3.0)])
    b = _r(spark, [(0, 0, 7.0)])
    cmp_r = _r(spark, [(0, 0, 5.0)])
    assert lm.percent_stack([a, b], cmp_r, "gt").collect()[0].value == 50.0
    assert lm.percent_stack([a, b], cmp_r, "lt").collect()[0].value == 50.0
    assert lm.count_if([a, b, cmp_r], 7.0).collect()[0].value == 1.0


def test_set_modify_nodata_roundtrip(spark):
    r = _r(spark, [(0, 0, 42.0), (0, 1, 7.0)])
    gone = lm.set_nodata_value(r, 42.0)
    vals = {(x.row, x.col): x.value for x in gone.collect()}
    assert vals[(0, 0)] is None and vals[(0, 1)] == 7.0
    back = lm.modify_nodata_value(gone, -9.0)
    vals = {(x.row, x.col): x.value for x in back.collect()}
    assert vals[(0, 0)] == -9.0 and vals[(0, 1)] == 7.0


def test_create_plane_corner_values(spark):
    from whitebox_tools_spark.catalog_grid import GRID

    out = lm.create_plane(spark, GRID, 1.0, 0.0, 0.0)
    got = {(x.row, x.col): x.value for x in out.collect()}
    assert len(got) == GRID.rows * GRID.cols
    # value = x-center; col 0 -> west + res/2
    assert got[(0, 0)] == GRID.west + GRID.res_x / 2.0
    assert got[(19, 19)] == GRID.west + GRID.res_x / 2.0 + 19 * GRID.res_x


def test_reclass_equal_interval_edges(spark):
    r = _r(spark, [(0, 0, 0.0), (0, 1, 7.4), (1, 0, 7.5), (1, 1, 15.1)])
    got = {(x.row, x.col): x.value for x in lm.reclass_equal_interval(r, 7.5).collect()}
    assert got == {(0, 0): 0.0, (0, 1): 0.0, (1, 0): 7.5, (1, 1): 15.0}