"""Query catalog: attribute-table (relational) ops + per-feature measures
(SURVEY.md §2.3, §2.4).

JoinTables / MergeVectors / ListUniqueValues / AttributeCorrelation run on
the TPC-H-ish fixture tables (the reference's dBase attribute tables are
plain relations; these are ours). Geometry measures run on the rect_layer
polygon fixture, whose vertex arrays are inlined as VALUES in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.operators import attributes as at
from whitebox_tools_spark.operators import measures as ms
from whitebox_tools_spark.sources import vectors
from whitebox_tools_spark.sources.tables import documents, load
from whitebox_tools_spark.localrel import local_df

_GEO_SQL = derive.sql_geometry_select("doc_id")
_PTS_CTE = f"pts AS (SELECT doc_id, {_GEO_SQL} FROM documents)"

CORR_FIELDS = ["l_quantity", "l_extendedprice", "l_discount"]


def q_join_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    return at.join_tables(cust, nat, "c_nationkey", "n_nationkey", ["n_name"]).select(
        "c_custkey", "c_name", "c_nationkey", "n_name"
    )


def q_merge_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name"), "c_acctbal"
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name"), "s_acctbal"
    )
    return at.merge_vectors([cust, supp])


def q_list_unique_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return at.list_unique_values(documents(spark, sf_dir), "lang")


def q_attribute_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = at.attribute_correlation(li, CORR_FIELDS)
    return out.select("field_a", "field_b", F.round("r", 6).alias("r"))


def q_remove_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # snap derived coords to a coarse grid so exact duplicates exist
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id").select(
        "doc_id",
        F.floor(F.col("x") / 100.0).cast("double").alias("x"),
        F.floor(F.col("y") / 100.0).cast("double").alias("y"),
        "z",
    )
    return at.remove_duplicates(geo).select("doc_id", "x", "y", "z")


def q_polygon_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    layer = local_df(spark, vectors.layer_to_rows(vectors.rect_layer()))
    out = ms.with_part_measures(layer)
    return out.select(
        "fid",
        "part",
        F.round("area", 6).alias("area"),
        F.round("perimeter", 6).alias("perimeter"),
    )


def q_compactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    layer = local_df(spark, vectors.layer_to_rows(vectors.rect_layer()))
    out = ms.compactness_ratio(layer)
    return out.select(
        "fid",
        F.round("area", 6).alias("area"),
        F.round("perimeter", 6).alias("perimeter"),
        F.round("compactness", 6).alias("compactness"),
    )


QUERIES = {
    "join_tables": q_join_tables,
    "merge_vectors": q_merge_vectors,
    "list_unique_values": q_list_unique_values,
    "attribute_correlation": q_attribute_correlation,
    "remove_duplicates": q_remove_duplicates,
    "polygon_measures": q_polygon_measures,
    "compactness": q_compactness,
}


# ------------------------------------------------------------- oracle SQL


def _layer_values_cte() -> str:
    rows = vectors.layer_to_rows(vectors.rect_layer())
    vals = []
    for r in rows:
        xs = "[" + ", ".join(repr(v) for v in r["xs"]) + "]"
        ys = "[" + ", ".join(repr(v) for v in r["ys"]) + "]"
        vals.append(f"({r['fid']}, {r['part']}, {str(r['is_hole']).upper()}, {xs}, {ys})")
    return (
        "layer(fid, part, is_hole, xs_c, ys_c) AS (VALUES "
        + ", ".join(vals)
        + "),\n"
        # strip the closing vertex (reference slices parts without the end)
        + "lyr AS (SELECT fid, part, is_hole, "
        + "list_slice(xs_c, 1, len(xs_c) - 1) AS xs, "
        + "list_slice(ys_c, 1, len(ys_c) - 1) AS ys FROM layer)"
    )


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
]

ORACLE_SQL = {
    "join_tables": """
SELECT c.c_custkey, c.c_name, c.c_nationkey, n.n_name
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
""",
    "merge_vectors": """
SELECT c_custkey AS key, c_name AS name, c_acctbal, NULL AS s_acctbal FROM customer
UNION ALL
SELECT s_suppkey AS key, s_name AS name, NULL AS c_acctbal, s_acctbal FROM supplier
""",
    "list_unique_values": """
SELECT lang, count(*) AS n FROM documents GROUP BY lang
""",
    "attribute_correlation": "\nUNION ALL\n".join(
        f"SELECT '{a}' AS field_a, '{b}' AS field_b, round(corr({a}, {b}), 6) AS r FROM lineitem"
        for a, b in _CORR_PAIRS
    ),
    "remove_duplicates": f"""
WITH {_PTS_CTE},
snapped AS (SELECT doc_id, CAST(floor(x / 100.0) AS DOUBLE) AS x,
                   CAST(floor(y / 100.0) AS DOUBLE) AS y, z FROM pts)
SELECT doc_id, x, y, z FROM snapped
QUALIFY row_number() OVER (PARTITION BY x, y ORDER BY doc_id) = 1
""",
    "polygon_measures": f"""
WITH {_layer_values_cte()}
SELECT fid, part,
       round({ms.part_area_sql()}, 6) AS area,
       round({ms.part_perimeter_sql()}, 6) AS perimeter
FROM lyr
""",
    "compactness": f"""
WITH {_layer_values_cte()},
m AS (SELECT fid, is_hole,
             {ms.part_area_sql()} AS area,
             {ms.part_perimeter_sql()} AS perimeter
      FROM lyr),
g AS (SELECT fid,
             sum(CASE WHEN is_hole THEN -area ELSE area END) AS area,
             sum(perimeter) AS perimeter
      FROM m GROUP BY fid)
SELECT fid, round(area, 6) AS area, round(perimeter, 6) AS perimeter,
       round(area / perimeter, 6) AS compactness
FROM g
""",
}
