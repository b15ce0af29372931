"""Replicates the driver's correctness gate locally: every queries() entry
is compared against its oracle_sql() DuckDB result at sf0.001
(row count + column names + order-insensitive values)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(val):
    """Sortable, type-canonical wrapper: (rank, value). Nulls and NaNs get
    their own ranks so mixed None/float columns still sort."""
    if val is None:
        return (0, 0)
    if isinstance(val, float):
        if math.isnan(val):
            return (1, 0)
        return (2, float(val))
    if isinstance(val, bool):
        return (2, float(val))
    if isinstance(val, int):
        return (2, float(val))
    return (3, str(val))


def _canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


@pytest.mark.parametrize("name", list(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in entry_mod.oracle_sql():
        # non-SQL-expressible op: driver records a rows-only check
        assert len(spark_rows) >= 0
        return

    sql = entry_mod.oracle_sql()[name]
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), "column names differ"
    assert len(spark_rows) == len(duck_rows), "row count differs"
    s_rows, _ = _canon_rows(spark_rows, spark_cols)
    d_rows, _ = _canon_rows(duck_rows, duck_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mismatches, f"{len(mismatches)} mismatched rows, first: " + str(
        (s_rows[mismatches[0]], d_rows[mismatches[0]])
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"tile", "poly_fid", "n_docs", "sum_z"}
