"""LiDAR point-cloud neighbourhood ops (SURVEY.md §2.7 lidar family)
over the derived point table — the FRS cell-join (operators.radius_join)
supplies the neighbourhoods, so every op here is a radius join + one
aggregation; nothing is per-row Python.

Flightline attributes (point_source_id, gps_time) are not part of the
interleaved-document contract, so they are derived with the same
counter-based LCG style as ``derive`` — deterministic at any partitioning
and reproducible in the SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.graph import connected_components
from whitebox_tools_spark.operators.radius_join import radius_join

PSID_A, PSID_B, PSID_MOD = 2654435761, 1013904223, 4
T_A, T_B = 1103515245, 12345
_M32 = 2**32


def with_flightline(geo: DataFrame, doc_id: str = "doc_id") -> DataFrame:
    """Add (psid, gps_time): hash-derived flightline id and timestamp."""
    d = F.col(doc_id)
    psid = F.pmod(F.pmod(d * F.lit(PSID_A) + F.lit(PSID_B), F.lit(_M32)), F.lit(PSID_MOD))
    t = F.pmod(d * F.lit(T_A) + F.lit(T_B), F.lit(_M32)).cast("double") / float(_M32) * 3600.0
    return geo.withColumn("psid", psid).withColumn("gps_time", t)


def _self_radius(geo: DataFrame, radius: float, keep=("z",)) -> DataFrame:
    """(doc_id, z, <point cols>_p, dist) self radius join."""
    pts = geo.select(
        F.col("doc_id").alias("pid"), "x", "y", *[c for c in keep if c != "z"], "z"
    )
    qs = geo.select("doc_id", "x", "y", *keep)
    return radius_join(pts, qs, radius, squared=True)  # dist = squared 2-D distance


def lidar_remove_outliers(
    geo: DataFrame, radius: float = 100.0, elev_diff: float = 50.0
) -> DataFrame:
    """LidarRemoveOutliers (lidar_outliers.rs:282-297): drop points whose
    |z - mean(z of radius neighbours at nonzero distance)| > elev_diff;
    points with no such neighbours use z itself as the residual (the
    reference's literal fallback)."""
    j = _self_radius(geo, radius).where(F.col("dist") != 0.0)  # d2 != 0 == dist != 0
    nb = j.groupBy("doc_id").agg(
        (F.sum("z_p") / F.count(F.lit(1))).alias("avg_z")
    )
    out = geo.join(nb, "doc_id", "left").withColumn(
        "resid",
        F.when(F.col("avg_z").isNotNull(), F.col("z") - F.col("avg_z")).otherwise(
            F.col("z")
        ),
    )
    return out.where(F.abs("resid") <= elev_diff).select("doc_id", "x", "y", "z")


def lidar_tophat(geo: DataFrame, radius: float = 100.0) -> DataFrame:
    """LidarTophatTransform (lidar_tophat_transform.rs:243-290): white
    top-hat = z - dilation(erosion(z)); erosion/dilation are the radius
    min / max (self included)."""
    ero = (
        _self_radius(geo, radius)
        .groupBy("doc_id", "x", "y", "z")
        .agg(F.min("z_p").alias("ero"))
    )
    pts2 = ero.select(
        F.col("doc_id").alias("pid"), "x", "y", F.col("ero").alias("z")
    )
    dil = (
        radius_join(pts2, ero.select("doc_id", "x", "y", "z"), radius)
        .groupBy("doc_id", "z")
        .agg(F.max("z_p").alias("dil"))
    )
    return dil.select("doc_id", (F.col("z") - F.col("dil")).alias("tophat"))


def pairs_3d(geo: DataFrame, radius: float) -> DataFrame:
    """Self radius-join pairs filtered to the true 3-D sphere — the shared
    neighbourhood frame of normal_vectors and lidar_segmentation (compute
    it once, localCheckpoint, pass to both)."""
    j = _self_radius(geo, radius)
    return j.where(
        F.col("dist")  # squared 2-D distance
        + (F.col("z") - F.col("z_p")) * (F.col("z") - F.col("z_p"))
        <= radius * radius
    )


def normal_vectors(
    geo: DataFrame, radius: float = 100.0, min_det: float = 1.0,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """NormalVectors (normal_vectors.rs:312-372): per point, best-
    conditioned least-squares plane normal over the 3-D radius
    neighbourhood (self included), normalized; (0,0,0) when < 3
    neighbours. Covariance uses raw moments (engine definition; the
    reference's explicit centroid subtraction is algebraically equal).
    ``pairs``: a precomputed :func:`pairs_3d` frame to reuse."""
    j = pairs if pairs is not None else pairs_3d(geo, radius)
    a = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_p").alias("sx"),
        F.sum("y_p").alias("sy"),
        F.sum("z_p").alias("sz"),
        F.sum(F.col("x_p") * F.col("x_p")).alias("sxx"),
        F.sum(F.col("x_p") * F.col("y_p")).alias("sxy"),
        F.sum(F.col("x_p") * F.col("z_p")).alias("sxz"),
        F.sum(F.col("y_p") * F.col("y_p")).alias("syy"),
        F.sum(F.col("y_p") * F.col("z_p")).alias("syz"),
        F.sum(F.col("z_p") * F.col("z_p")).alias("szz"),
    )
    n = F.col("n").cast("double")
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
    vx = F.when(det_max == det_x, F.lit(1.0)).when(
        det_max == det_y, (yz * xz - xy * zz) / det_y
    ).otherwise((yz * xy - xz * yy) / det_z)
    vy = F.when(det_max == det_x, (xz * yz - xy * zz) / det_x).when(
        det_max == det_y, F.lit(1.0)
    ).otherwise((xz * xy - yz * xx) / det_z)
    vz = F.when(det_max == det_x, (xy * yz - xz * yy) / det_x).when(
        det_max == det_y, (xy * xz - yz * xx) / det_y
    ).otherwise(F.lit(1.0))
    norm = F.sqrt(vx * vx + vy * vy + vz * vz)
    ok = (F.col("n") >= 3) & (det_max > min_det)
    return a.select(
        "doc_id",
        F.when(ok, vx / norm).otherwise(0.0).alias("nx"),
        F.when(ok, vy / norm).otherwise(0.0).alias("ny"),
        F.when(ok, vz / norm).otherwise(0.0).alias("nz"),
    )


def classify_overlap_points(geo: DataFrame, resolution: float = 250.0) -> DataFrame:
    """ClassifyOverlapPoints (classify_overlap_points.rs): per grid cell
    of the given resolution, the flightline whose earliest gps_time in
    that cell is smallest is primary; points of other flightlines are
    overlap (1.0). Ties break to the smaller psid."""
    g = with_flightline(geo)
    cells = g.select(
        "doc_id",
        "psid",
        "gps_time",
        F.floor(F.col("x") / resolution).alias("ci"),
        F.floor(F.col("y") / resolution).alias("cj"),
    )
    per_fl = cells.groupBy("ci", "cj", "psid").agg(F.min("gps_time").alias("t0"))
    w = Window.partitionBy("ci", "cj").orderBy(F.col("t0").asc(), F.col("psid").asc())
    prim = per_fl.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
        "ci", "cj", F.col("psid").alias("prim")
    )
    return (
        cells.join(prim, ["ci", "cj"])
        .select(
            "doc_id",
            F.when(F.col("psid") == F.col("prim"), F.lit(0.0)).otherwise(1.0).alias(
                "overlap"
            ),
        )
    )


def lidar_segmentation(
    geo: DataFrame, radius: float = 100.0, max_angle_deg: float = 15.0,
    nv: DataFrame | None = None, pairs: DataFrame | None = None,
) -> DataFrame:
    """LidarSegmentation (lidar_segmentation.rs, region growing):
    segments = connected components over 3-D radius-neighbour pairs whose
    plane normals agree within max_angle (|dot| >= cos(max_angle));
    segment id = dense rank of the segment's min point id (canonical).
    Pass ``nv`` (a normal_vectors frame) to reuse precomputed normals."""
    import math

    if nv is None:
        nv = normal_vectors(geo, radius, pairs=pairs)
    if pairs is not None:
        # reuse the shared 3-D pair frame: attach normals to both sides
        # instead of re-running the radius join
        j = pairs.where(F.col("dist") != 0.0).join(nv, "doc_id").join(
            nv.select(
                F.col("doc_id").alias("pid_p"),
                F.col("nx").alias("nx_p"),
                F.col("ny").alias("ny_p"),
                F.col("nz").alias("nz_p"),
            ),
            "pid_p",
        )
    else:
        pts = geo.join(nv, "doc_id")
        p = pts.select(
            F.col("doc_id").alias("pid"), "x", "y", "z", "nx", "ny", "nz"
        )
        q = pts.select("doc_id", "x", "y", "z", "nx", "ny", "nz")
        j = radius_join(p, q, radius, squared=True).where(F.col("dist") != 0.0)
        j = j.where(
            F.col("dist")  # squared 2-D distance
            + (F.col("z") - F.col("z_p")) * (F.col("z") - F.col("z_p"))
            <= radius * radius
        )
    dot = (
        F.col("nx") * F.col("nx_p")
        + F.col("ny") * F.col("ny_p")
        + F.col("nz") * F.col("nz_p")
    )  # point-side normals carry the _p suffix from radius_join
    edges = j.where(F.abs(dot) >= math.cos(math.radians(max_angle_deg))).select(
        F.col("doc_id").alias("a"), F.col("pid_p").alias("b")
    )
    nodes = geo.select(F.col("doc_id").alias("id"))
    comps = connected_components(edges, nodes, "id")
    first = comps.groupBy("comp").agg(F.min("node").alias("first_id"))
    ranked = first.withColumn(
        "seg", F.row_number().over(Window.orderBy("first_id"))
    )
    return comps.join(ranked, "comp").select(
        F.col("node").alias("doc_id"), F.col("seg").cast("double").alias("segment")
    )
