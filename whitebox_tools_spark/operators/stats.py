"""Statistical tests / model fits over rasters (SURVEY.md §2.7,
math_stat_analysis/*.rs). Every op is one or two map-side-combinable
aggregations — no collect loops; results are single-row DataFrames of
named statistics (the reference renders the same numbers into HTML).

RandomField / RandomSample use a counter-based (hash) RNG keyed on the
cell id — the distributed-reproducibility analogue of the reference's
sequential `rand` streams (math_stat_analysis/random_field.rs): any
partitioning yields the same field, which a seeded sequential generator
cannot do on a cluster.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.gridding import GridConfig

D8_DX = (1, 1, 1, 0, -1, -1, -1, 0)
D8_DY = (-1, 0, 1, 1, 1, 0, -1, -1)
CONTIGUITY = {
    "rook": [(0, -1), (0, 1), (-1, 0), (1, 0)],
    "king": list(zip(D8_DX, D8_DY)),
    "bishop": [(1, -1), (1, 1), (-1, 1), (-1, -1)],
}


def _join2(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.select("row", "col", F.col("value").alias("va")).join(
        b.select("row", "col", F.col("value").alias("vb")), ["row", "col"]
    )


def paired_t_test(a: DataFrame, b: DataFrame) -> DataFrame:
    """PairedSampleTTest (math_stat_analysis/paired_sample_t_test.rs):
    t = mean(d) / (sd(d)/sqrt(n)) over cells valid in both rasters."""
    d = _join2(a, b).select((F.col("va") - F.col("vb")).alias("d"))
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("s"),
        F.sum(F.col("d") * F.col("d")).alias("ss"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s") / n
    var = (F.col("ss") - (F.col("s") * F.col("s")) / n) / (n - 1.0)
    sd = F.sqrt(var)
    return agg.select(
        F.col("n"),
        mean.alias("mean_diff"),
        sd.alias("sd_diff"),
        (mean / (sd / F.sqrt(n))).alias("t_stat"),
    )


def two_sample_ks_test(s1: DataFrame, s2: DataFrame, col: str = "value") -> DataFrame:
    """TwoSampleKsTest (two_sample_ks_test.rs): D = max |ECDF1 - ECDF2|
    over the union of sample values — one sort-free cumulative window."""
    u = s1.select(F.col(col).alias("v"), F.lit(1).alias("c1"), F.lit(0).alias("c2")).unionAll(
        s2.select(F.col(col).alias("v"), F.lit(0).alias("c1"), F.lit(1).alias("c2"))
    )
    per_v = u.groupBy("v").agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        F.sum("c1").over(w).alias("f1"), F.sum("c2").over(w).alias("f2")
    )
    n1 = s1.count()
    n2 = s2.count()
    return cum.agg(
        F.max(
            F.abs(F.col("f1") / F.lit(float(n1)) - F.col("f2") / F.lit(float(n2)))
        ).alias("d_stat")
    ).select(F.lit(n1).alias("n1"), F.lit(n2).alias("n2"), "d_stat")


def wilcoxon_signed_rank_test(a: DataFrame, b: DataFrame) -> DataFrame:
    """WilcoxonSignedRankTest (wilcoxon_signed_rank_test.rs): signed ranks
    of |d| (zero differences dropped, tied ranks averaged);
    z = (W - n(n+1)/4) / sqrt(n(n+1)(2n+1)/24), W = min(W+, W-).

    Average rank of |d| = (#strictly smaller) + (#equal + 1)/2 — computed
    with one self-agg join, no sort."""
    d = (
        _join2(a, b)
        .select((F.col("va") - F.col("vb")).alias("d"))
        .where(F.col("d") != 0.0)
        .select("d", F.abs("d").alias("ad"))
    )
    per = d.groupBy("ad").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("pos"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.select(
        "ad",
        "cnt",
        "pos",
        (
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("double")
            + (F.col("cnt") + 1.0) / 2.0
        ).alias("avg_rank"),
    )
    agg = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("avg_rank") * F.col("pos")).alias("w_plus"),
        F.sum(F.col("avg_rank") * (F.col("cnt") - F.col("pos"))).alias("w_minus"),
    )
    n = F.col("n").cast("double")
    wmin = F.least("w_plus", "w_minus")
    z = (wmin - n * (n + 1.0) / 4.0) / F.sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0)
    return agg.select("n", "w_plus", "w_minus", z.alias("z_stat"))


def anova(values: DataFrame, zones: DataFrame) -> DataFrame:
    """Anova (anova.rs:395-434): one-way ANOVA of raster values grouped
    by an integer feature raster. ss_w = sum(z^2) - sum_i(sum_i^2/n_i)."""
    j = _join2(values, zones)
    per = j.groupBy("vb").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("va").alias("si"),
        F.sum(F.col("va") * F.col("va")).alias("ssi"),
    )
    agg = per.agg(
        F.sum("ni").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("si").alias("s"),
        F.sum("ssi").alias("ss"),
        F.sum(F.col("si") * F.col("si") / F.col("ni").cast("double")).alias("ssg"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    grand_mean_ss = (F.col("s") * F.col("s")) / n
    ss_b = F.col("ssg") - grand_mean_ss
    ss_w = F.col("ss") - F.col("ssg")
    f = (ss_b / (k - 1.0)) / (ss_w / (n - k))
    return agg.select(
        F.col("n"),
        F.col("k").alias("num_classes"),
        ss_b.alias("ss_between"),
        ss_w.alias("ss_within"),
        f.alias("f_stat"),
    )


def image_regression(x: DataFrame, y: DataFrame) -> DataFrame:
    """ImageRegression (image_regression.rs:356-366): OLS y = mx + b over
    cells valid in both; slope, intercept, r^2."""
    j = _join2(x, y)
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("va").alias("sx"),
        F.sum("vb").alias("sy"),
        F.sum(F.col("va") * F.col("vb")).alias("sxy"),
        F.sum(F.col("va") * F.col("va")).alias("sxx"),
        F.sum(F.col("vb") * F.col("vb")).alias("syy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "n", slope.alias("slope"), intercept.alias("intercept"), (r * r).alias("r_sqr")
    )


def morans_i(raster: DataFrame, cfg: GridConfig, contiguity: str = "rook") -> DataFrame:
    """ImageAutocorrelation (image_autocorrelation.rs:360-407):
    I = n * sum_pairs((zi-mean)(zj-mean)) / (sum((zi-mean)^2) * W),
    W = number of directed valid neighbour pairs."""
    offs = CONTIGUITY[contiguity]
    stats = raster.agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    cells = raster.crossJoin(F.broadcast(stats)).select(
        "row", "col", "value", (F.col("s") / F.col("n").cast("double")).alias("mean"), "n"
    )
    off = F.array(
        *[F.struct(F.lit(dy).alias("dr"), F.lit(dx).alias("dc")) for dx, dy in offs]
    )
    ex = cells.select("row", "col", "value", "mean", "n", F.explode(off).alias("o"))
    probe = ex.select(
        (F.col("row") + F.col("o.dr")).alias("nr"),
        (F.col("col") + F.col("o.dc")).alias("nc"),
        F.col("value").alias("zi"),
        "mean",
        "n",
    )
    nbr = cells.select(
        F.col("row").alias("nr"), F.col("col").alias("nc"), F.col("value").alias("zj")
    )
    pairs = probe.join(nbr, ["nr", "nc"])
    num = pairs.agg(
        F.sum((F.col("zi") - F.col("mean")) * (F.col("zj") - F.col("mean"))).alias("num"),
        F.count(F.lit(1)).alias("w"),
        F.any_value("n").alias("n"),
        F.any_value("mean").alias("mean"),
    )
    dev = cells.agg(
        F.sum((F.col("value") - F.col("mean")) * (F.col("value") - F.col("mean"))).alias(
            "dev"
        )
    )
    return num.crossJoin(dev).select(
        F.col("n"),
        F.col("w").alias("num_pairs"),
        (
            F.col("n").cast("double") * F.col("num") / (F.col("dev") * F.col("w").cast("double"))
        ).alias("moran_i"),
    )


def crispness_index(raster: DataFrame) -> DataFrame:
    """CrispnessIndex (crispness_index.rs:278-314):
    C = sum((z-mean)^2) / (sum*(1-mean)^2 + (n-sum)*mean^2) over valid
    cells (intended for membership-probability rasters)."""
    agg = raster.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s") / n
    total_dev = F.col("ss") - n * mean * mean
    denom = F.col("s") * (1.0 - mean) * (1.0 - mean) + (n - F.col("s")) * mean * mean
    return agg.select(F.col("n"), (total_dev / denom).alias("crispness"))


def covariance_matrix(df: DataFrame, features: list[str]) -> DataFrame:
    """Pairwise sample covariances (PrincipalComponentAnalysis moment
    pass, principal_component_analysis.rs) — long form (fi, fj, cov)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for f in features:
        aggs.append(F.sum(F.col(f)).alias(f"s_{f}"))
    for i, fi in enumerate(features):
        for fj in features[i:]:
            aggs.append(F.sum(F.col(fi) * F.col(fj)).alias(f"ss_{fi}_{fj}"))
    agg = df.agg(*aggs)
    n = F.col("n").cast("double")
    rows = []
    for i, fi in enumerate(features):
        for fj in features[i:]:
            cov = (
                F.col(f"ss_{fi}_{fj}") - F.col(f"s_{fi}") * F.col(f"s_{fj}") / n
            ) / (n - 1.0)
            rows.append(
                F.struct(F.lit(fi).alias("fi"), F.lit(fj).alias("fj"), cov.alias("cov"))
            )
    return agg.select(F.explode(F.array(*rows)).alias("e")).select(
        F.col("e.fi").alias("fi"), F.col("e.fj").alias("fj"), F.col("e.cov").alias("cov")
    )


def pca(df: DataFrame, features: list[str]):
    """PrincipalComponentAnalysis: covariance aggregation (distributed)
    + eigen-decomposition of the tiny k x k matrix on the driver.
    Returns (eigenvalues desc, eigenvectors columns, explained %)."""
    import numpy as np

    k = len(features)
    rows = covariance_matrix(df, features).collect()
    c = np.zeros((k, k))
    idx = {f: i for i, f in enumerate(features)}
    for r in rows:
        i, j = idx[r["fi"]], idx[r["fj"]]
        c[i, j] = c[j, i] = r["cov"]
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    return vals, vecs, vals / vals.sum() * 100.0


# ------------------------------------------------- counter-based RNG ops

_RF_A1, _RF_B1 = 1103515245, 12345
_RF_A2, _RF_B2 = 69069, 362437
_M32 = 2**32


def _hash_u01(cell: Column, a: int, b: int) -> Column:
    h = F.pmod(cell * F.lit(a) + F.lit(b), F.lit(_M32))
    return (h.cast("double") + 1.0) / float(_M32)  # (0, 1]


def random_field(spark, cfg: GridConfig) -> DataFrame:
    """RandomField (random_field.rs) with a counter-based generator:
    per-cell Box-Muller gaussian from two LCG hashes of the cell id."""
    rows = spark.range(cfg.rows).select(F.col("id").alias("row"))
    cols = spark.range(cfg.cols).select(F.col("id").alias("col"))
    cells = rows.crossJoin(cols)
    cell = F.col("row") * cfg.cols + F.col("col")
    u1 = _hash_u01(cell, _RF_A1, _RF_B1)
    u2 = _hash_u01(cell, _RF_A2, _RF_B2)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)
    return cells.select("row", "col", z.alias("value"))


def random_sample(raster: DataFrame, cfg: GridConfig, modulo: int = 7) -> DataFrame:
    """RandomSample (random_sample.rs) with the same counter-based
    hash: sampled cells get 1.0, the rest of the raster 0.0."""
    cell = F.col("row") * cfg.cols + F.col("col")
    h = F.pmod(cell * F.lit(_RF_A1) + F.lit(_RF_B1), F.lit(_M32))
    return raster.select(
        "row",
        "col",
        F.when(F.pmod(h, F.lit(modulo)) == 0, F.lit(1.0)).otherwise(0.0).alias("value"),
    )
