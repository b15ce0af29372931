"""Per-group shape kernels: convex hull, minimum bounding box/circle,
axis measures (MinimumConvexHull / MinimumBoundingBox /
MinimumBoundingCircle / PolygonLongAxis / PolygonShortAxis /
ElongationRatio / PatchOrientation analogues over point groups).

Each group (a feature's vertices, a tile's points, a class's cells) is
collected into one Arrow batch via ``applyInPandas`` — groups are small
(feature-sized) while the number of groups scales; exactly the
distribution profile Spark handles well. Kernels are the reference
transcriptions in kernels/hull.py.

Reference measures:
- ElongationRatio (gis_analysis/elongation_ratio.rs): 1 - short/long of
  the minimum (area) bounding box.
- PatchOrientation (patch_orientation.rs): the MBB slope in degrees.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.kernels.geometry import polygon_area, polygon_perimeter
from whitebox_tools_spark.kernels.hull import (
    convex_hull,
    minimum_bounding_box,
    smallest_enclosing_circle,
)

_SHAPE_SCHEMA = T.StructType(
    [
        T.StructField("group", T.LongType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("hull_vertices", T.IntegerType()),
        T.StructField("hull_area", T.DoubleType()),
        T.StructField("hull_perimeter", T.DoubleType()),
        T.StructField("mbb_long_axis", T.DoubleType()),
        T.StructField("mbb_short_axis", T.DoubleType()),
        T.StructField("elongation", T.DoubleType()),
        T.StructField("orientation_deg", T.DoubleType()),
        T.StructField("circle_x", T.DoubleType()),
        T.StructField("circle_y", T.DoubleType()),
        T.StructField("circle_radius", T.DoubleType()),
    ]
)


def group_shape_stats(
    points: DataFrame, group: str, x: str = "x", y: str = "y"
) -> DataFrame:
    """Hull / MBB / enclosing-circle statistics per group."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf[group].iloc[0])
        pts = pdf[[x, y]].to_numpy(dtype=np.float64)
        if len(pts) < 3:
            cx, cy, r = smallest_enclosing_circle(pts)
            return pd.DataFrame(
                [
                    (
                        g, len(pts), len(pts), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                        cx, cy, r,
                    )
                ],
                columns=[f.name for f in _SHAPE_SCHEMA.fields],
            )
        hull = convex_hull(pts)
        area = polygon_area(hull)
        perim = polygon_perimeter(np.vstack([hull, hull[:1]]))
        _corners, long_ax, short_ax, slope = minimum_bounding_box(pts, "area")
        elong = 1.0 - short_ax / long_ax if long_ax > 0 else 0.0
        cx, cy, r = smallest_enclosing_circle(pts)
        return pd.DataFrame(
            [
                (
                    g,
                    len(pts),
                    len(hull),
                    float(area),
                    float(perim),
                    float(long_ax),
                    float(short_ax),
                    float(elong),
                    math.degrees(slope),
                    cx,
                    cy,
                    r,
                )
            ],
            columns=[f.name for f in _SHAPE_SCHEMA.fields],
        )

    return (
        points.select(F.col(group).cast("long").alias(group), x, y)
        .groupBy(group)
        .applyInPandas(run, schema=_SHAPE_SCHEMA)
        .withColumnRenamed("group", group)
    )
