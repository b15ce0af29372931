"""Point-in-polygon overlay joins (Clip / Erase / ClipLidarToPolygon family).

Parity contracts:
- Clip point mode (src/tools/gis_analysis/clip.rs:292-340): per point,
  iterate ALL parts of the clip layer in order; bbox pre-test; a shell hit
  sets inside=true, a hole hit sets inside=false; LAST matching part wins.
- ClipLidarToPolygon (src/tools/lidar_analysis/clip_lidar_to_polygon.rs:
  264-310): per polygon record, shells first (any hit -> inside), then
  holes (any hit -> outside).
- PIP kernel itself: winding even-odd, kernels/geometry.py.

Scale design: the polygon layer is SMALL (the reference reads the whole
clip shapefile into memory); we broadcast it and evaluate membership in an
Arrow-batched ``mapInPandas`` — a NARROW transformation: no shuffle at all,
scales linearly with the point/document table and survives a 1000-executor
100 TB scan unchanged. A per-feature vectorized bbox pre-filter prunes the
winding evaluation exactly like the reference's ``is_point_in_box`` gate.

For huge polygon layers a cell-join path would be required; that variant
shares the cell machinery in operators/cells.py (future work, not needed
for reference parity).
"""

from __future__ import annotations

from typing import Iterator, Literal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.kernels.geometry import point_in_poly
from whitebox_tools_spark.sources.vectors import PolygonFeature

Mode = Literal["semi", "anti"]
PartMode = Literal["last_wins", "shell_then_hole"]


def _membership(
    px: np.ndarray, py: np.ndarray, layer: list[PolygonFeature], part_mode: PartMode
) -> np.ndarray:
    inside = np.zeros(len(px), dtype=bool)
    if part_mode == "last_wins":
        # clip.rs flattens (bbox, ring, is_hole) across all features and
        # iterates in order; last hit wins.
        for feat in layer:
            xmin, ymin, xmax, ymax = feat.bbox
            in_bb = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
            if not in_bb.any():
                continue
            idx = np.nonzero(in_bb)[0]
            for ring, hole in zip(feat.rings, feat.holes):
                hit = point_in_poly(px[idx], py[idx], ring)
                inside[idx[hit]] = not hole
        return inside
    # shell_then_hole: per feature record, shells tested first (any hit ->
    # true), then holes (any hit -> false, overriding the shell verdict).
    # The membership flag persists ACROSS records in the reference (it is
    # initialized once per point, clip_lidar_to_polygon.rs:269), so a later
    # record's verdict overwrites an earlier one's wherever it hits.
    for feat in layer:
        xmin, ymin, xmax, ymax = feat.bbox
        in_bb = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
        if not in_bb.any():
            continue
        idx = np.nonzero(in_bb)[0]
        shell_hit = np.zeros(len(idx), dtype=bool)
        for ring, hole in zip(feat.rings, feat.holes):
            if not hole:
                shell_hit |= point_in_poly(px[idx], py[idx], ring)
        hole_hit = np.zeros(len(idx), dtype=bool)
        for ring, hole in zip(feat.rings, feat.holes):
            if hole:
                hole_hit |= point_in_poly(px[idx], py[idx], ring)
        inside[idx] = np.where(hole_hit, False, np.where(shell_hit, True, inside[idx]))
    return inside


def clip_points(
    points: DataFrame,
    layer: list[PolygonFeature],
    mode: Mode = "semi",
    part_mode: PartMode = "last_wins",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Spatial semi/anti join of a point table against a broadcast layer."""
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(layer)
    want = mode == "semi"
    schema = points.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lyr = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            inside = _membership(px, py, lyr, part_mode)
            yield pdf[inside == want]

    return points.mapInPandas(run, schema=schema)


def tag_polygon(
    points: DataFrame,
    layer: list[PolygonFeature],
    part_mode: PartMode = "last_wins",
    x: str = "x",
    y: str = "y",
    out: str = "poly_fid",
) -> DataFrame:
    """Adds the containing feature fid (last-wins order), null if none.

    This is the join form of the overlay (what Intersect point-mode needs to
    merge attributes); fid assignment follows the same part iteration order.
    """
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(layer)
    # copy — StructType.add mutates in place, corrupting the cached schema
    schema = T.StructType(list(points.schema.fields) + [T.StructField(out, T.LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lyr = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            fid = np.full(len(pdf), -1, dtype=np.int64)
            if part_mode == "last_wins":
                for feat in lyr:
                    xmin, ymin, xmax, ymax = feat.bbox
                    in_bb = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
                    if not in_bb.any():
                        continue
                    idx = np.nonzero(in_bb)[0]
                    for ring, hole in zip(feat.rings, feat.holes):
                        hit = point_in_poly(px[idx], py[idx], ring)
                        fid[idx[hit]] = -1 if hole else feat.fid
            else:
                for feat in lyr:
                    xmin, ymin, xmax, ymax = feat.bbox
                    in_bb = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
                    if not in_bb.any():
                        continue
                    idx = np.nonzero(in_bb)[0]
                    m = _membership(px[idx], py[idx], [feat], "shell_then_hole")
                    sel = idx[m & (fid[idx] == -1)]
                    fid[sel] = feat.fid
            res = pdf.copy()
            res[out] = pd.array(
                [None if v < 0 else int(v) for v in fid], dtype="Int64"
            )
            yield res

    return points.mapInPandas(run, schema=schema)
