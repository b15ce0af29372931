"""LidarRansacPlanes (lidar_analysis/lidar_ransac_planes.rs).

Per point: take the 3-D radius neighbourhood, run ``num_iter`` RANSAC
rounds (sample ``num_samples`` points, least-squares plane via the
best-conditioned covariance path :623-689, inliers by |vertical
residual| <= threshold :382, refit on inliers when the model reaches
``model_size`` :386, keep the refit with minimum RMSE, first round wins
ties :390-399), then flag the point planar when the winning plane's
vertical residual at the point is <= threshold (:406 — the reference
omits abs() in this final test; transcribed as-is).

Engine form — RANSAC without a loop and without Python:
- the reference samples with ``thread_rng`` (non-deterministic run to
  run); the engine instead ranks each neighbourhood by the portable
  60-bit hash h60(pid:nid:round) and takes the top ``num_samples`` —
  a deterministic pseudo-random draw that both Spark and DuckDB can
  compute, which makes the whole pipeline exactly oracle-checkable
  (documented deviation);
- all rounds evaluate at once: the neighbourhood join is exploded by a
  literal round array, and every stage (fit, inlier filter, refit,
  RMSE, argmin) is a plain aggregation — one shuffle each, no UDF,
  no driver loop;
- covariance uses raw moments (one pass) rather than the reference's
  explicit centroid subtraction — algebraically equal, same convention
  as operators/lidar.normal_vectors.

Degenerate fits (zero determinant / c == 0) produce inf/NaN residuals
and NaN RMSE; NaN orders last in both engines' aggregates, so those
rounds lose exactly as the reference's ``rmse < min_rmse`` skips them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.lidar import _self_radius
from whitebox_tools_spark.operators.text import h60


def _fit_cols(prefix: str = ""):
    """Plane (a,b,c,d) aggregate expressions from raw-moment columns."""
    n = F.col("fn").cast("double")
    cx, cy, cz = F.col("sx") / n, F.col("sy") / n, F.col("sz") / n
    xx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    xy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    xz = F.col("sxz") - F.col("sx") * F.col("sz") / n
    yy = F.col("syy") - F.col("sy") * F.col("sy") / n
    yz = F.col("syz") - F.col("sy") * F.col("sz") / n
    zz = F.col("szz") - F.col("sz") * F.col("sz") / n
    det_x = yy * zz - yz * yz
    det_y = xx * zz - xz * xz
    det_z = xx * yy - xy * xy
    det_max = F.greatest(det_x, det_y, det_z)
    # try_divide: a zero determinant / zero c yields NULL instead of the
    # ANSI DIVIDE_BY_ZERO error; NULL residuals fail the inlier test just
    # as the oracle's IEEE infinities do, so degenerate rounds lose
    # identically on both engines.
    a = F.when(det_max == det_x, F.lit(1.0)).when(
        det_max == det_y, F.try_divide(yz * xz - xy * zz, det_y)
    ).otherwise(F.try_divide(yz * xy - xz * yy, det_z))
    b = F.when(det_max == det_x, F.try_divide(xz * yz - xy * zz, det_x)).when(
        det_max == det_y, F.lit(1.0)
    ).otherwise(F.try_divide(xz * xy - yz * xx, det_z))
    c = F.when(det_max == det_x, F.try_divide(xy * yz - xz * yy, det_x)).when(
        det_max == det_y, F.try_divide(xy * xz - yz * xx, det_y)
    ).otherwise(F.lit(1.0))
    d = -a * cx + -b * cy + -c * cz
    return [
        a.alias(prefix + "a"), b.alias(prefix + "b"),
        c.alias(prefix + "c"), d.alias(prefix + "d"),
    ]


def _moments():
    return [
        F.count(F.lit(1)).alias("fn"),
        F.sum("px").alias("sx"), F.sum("py").alias("sy"), F.sum("pz").alias("sz"),
        F.sum(F.col("px") * F.col("px")).alias("sxx"),
        F.sum(F.col("px") * F.col("py")).alias("sxy"),
        F.sum(F.col("px") * F.col("pz")).alias("sxz"),
        F.sum(F.col("py") * F.col("py")).alias("syy"),
        F.sum(F.col("py") * F.col("pz")).alias("syz"),
        F.sum(F.col("pz") * F.col("pz")).alias("szz"),
    ]


def _residual(a, b, c, d, x, y, z):
    """Vertical residual z - (-(d + a x + b y) / c) — Plane::residual."""
    return z - F.try_divide(-(d + a * x + b * y), c)


def lidar_ransac_planes(
    geo: DataFrame,
    radius: float = 60.0,
    num_iter: int = 8,
    num_samples: int = 5,
    threshold: float = 5.0,
    model_size: int = 10,
) -> DataFrame:
    """(doc_id, planar 0.0/1.0) — is the point part of a planar surface."""
    if model_size < num_samples:
        model_size = num_samples
    j = _self_radius(geo, radius)
    j = j.where(
        F.col("dist")
        + (F.col("z") - F.col("z_p")) * (F.col("z") - F.col("z_p"))
        <= radius * radius
    )
    nbrs = j.select(
        "doc_id", F.col("pid_p").alias("pid"),
        F.col("x_p").alias("px"), F.col("y_p").alias("py"), F.col("z_p").alias("pz"),
    )
    cnt = nbrs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nn"))
    elig = nbrs.join(cnt.where(F.col("nn") > num_samples).select("doc_id"), "doc_id")

    rounds = F.explode(F.array(*[F.lit(t) for t in range(num_iter)])).alias("t")
    ex = elig.select("*", rounds).withColumn(
        "h",
        h60(F.concat_ws(":", F.col("doc_id"), F.col("pid"), F.col("t"))),
    )
    w = Window.partitionBy("doc_id", "t").orderBy("h", "pid")
    samples = ex.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= num_samples
    )
    fit0 = samples.groupBy("doc_id", "t").agg(*_moments()).select(
        "doc_id", "t", *_fit_cols()
    )
    inl = (
        elig.join(fit0, "doc_id")
        .where(
            F.abs(
                _residual(
                    F.col("a"), F.col("b"), F.col("c"), F.col("d"),
                    F.col("px"), F.col("py"), F.col("pz"),
                )
            )
            <= threshold
        )
        .select("doc_id", "t", "px", "py", "pz")
        .localCheckpoint(eager=True)
    )
    refit = (
        inl.groupBy("doc_id", "t")
        .agg(*_moments())
        .where(F.col("fn") >= model_size)
        .select("doc_id", "t", *_fit_cols("r"))
    )
    rmse = (
        inl.join(refit, ["doc_id", "t"])
        .groupBy("doc_id", "t", "ra", "rb", "rc", "rd")
        .agg(
            F.sqrt(
                F.sum(
                    _residual(
                        F.col("ra"), F.col("rb"), F.col("rc"), F.col("rd"),
                        F.col("px"), F.col("py"), F.col("pz"),
                    )
                    * _residual(
                        F.col("ra"), F.col("rb"), F.col("rc"), F.col("rd"),
                        F.col("px"), F.col("py"), F.col("pz"),
                    )
                )
                / F.count(F.lit(1))
            ).alias("rmse")
        )
    )
    # Argmin on ROUNDED rmse (9 dp): a numerically perfect refit's rmse
    # is pure float-summation noise (~1e-12) that differs between engines
    # by evaluation order, so comparing raw values makes the winning
    # round engine-dependent. Rounding collapses noise-level values to a
    # tie and the deterministic round index t decides identically in
    # Spark and DuckDB.
    best = (
        rmse.where(F.col("rmse").isNotNull()).groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    F.round(F.col("rmse"), 9).alias("rmse_r"), F.col("t"),
                    F.col("ra"), F.col("rb"), F.col("rc"), F.col("rd"),
                    F.col("rmse"),
                )
            ).alias("m")
        )
        .select(
            "doc_id",
            F.col("m.ra").alias("ra"), F.col("m.rb").alias("rb"),
            F.col("m.rc").alias("rc"), F.col("m.rd").alias("rd"),
            F.col("m.rmse").alias("rmse"),
        )
    )
    return geo.join(best, "doc_id", "left").select(
        "doc_id",
        F.when(
            F.col("ra").isNotNull()
            & ~F.isnan("rmse")
            & (
                _residual(
                    F.col("ra"), F.col("rb"), F.col("rc"), F.col("rd"),
                    F.col("x"), F.col("y"), F.col("z"),
                )
                <= threshold
            ),
            1.0,
        )
        .otherwise(0.0)
        .alias("planar"),
    )
