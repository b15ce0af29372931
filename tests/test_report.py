"""HTML report sinks: structure, escaping, size guard."""

import pytest

from whitebox_tools_spark import report
from whitebox_tools_spark.localrel import local_df


def test_histogram_html(spark):
    df = local_df(spark, [(0, 5), (1, 12), (2, 3)], columns=["bin", "n"])
    out = report.histogram_html(df)
    assert out.startswith("<!DOCTYPE html>")
    assert out.count("<rect") == 3
    assert "12" in out  # peak label


def test_table_escapes(spark):
    df = local_df(spark, [("<b>x</b>", 1)], columns=["name", "v"])
    out = report.table_html(df, title="T<i>")
    assert "&lt;b&gt;x&lt;/b&gt;" in out
    assert "T&lt;i&gt;" in out


def test_scattergram_and_line(spark):
    df = local_df(
        spark,
        [(0.0, 1.0, "a"), (1.0, 3.0, "a"), (0.0, 2.0, "b"), (1.0, 0.5, "b")],
        columns=["x", "y", "s"],
    )
    sc = report.scattergram_html(df, "x", "y")
    assert sc.count("<circle") == 4
    lg = report.line_graph_html(df, "x", "y", series_col="s")
    assert lg.count("<polyline") == 2


def test_size_guard(spark):
    big = spark.range(0, 200_000).selectExpr("id AS bin", "id AS n")
    with pytest.raises(ValueError):
        report.histogram_html(big)


def test_write_report(spark, tmp_path):
    df = local_df(spark, [(0, 1)], columns=["bin", "n"])
    p = tmp_path / "r.html"
    report.write_report(report.histogram_html(df), str(p))
    assert p.read_text().startswith("<!DOCTYPE html>")
