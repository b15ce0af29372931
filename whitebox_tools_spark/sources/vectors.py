"""Polygon fixture layers.

A polygon *layer* is represented two ways, kept in sync:
- engine form: a small Python list of features (numpy rings + hole flags +
  attrs), broadcast to executors for the PIP UDFs (mirrors the reference,
  which always holds the whole clip shapefile in memory,
  src/tools/gis_analysis/clip.rs Shapefile::read); and
- relational form: a DataFrame (fid, part, is_hole, xs, ys, bbox, attrs)
  for SQL-side uses.

Hole convention: a part is a hole iff its ring is counter-clockwise
(src/vector/shapefile/geometry.rs:305+); builders below orient rings
accordingly (CW shells, CCW holes, y-up frame).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class PolygonFeature:
    fid: int
    rings: list  # list[np.ndarray (n,2) closed]
    holes: list  # list[bool]
    attrs: dict = field(default_factory=dict)

    @property
    def bbox(self):
        allp = np.vstack(self.rings)
        return (
            float(allp[:, 0].min()),
            float(allp[:, 1].min()),
            float(allp[:, 0].max()),
            float(allp[:, 1].max()),
        )


def rect_ring(xmin: float, ymin: float, xmax: float, ymax: float, hole: bool = False) -> np.ndarray:
    """Closed axis-aligned ring; CW for shells, CCW for holes (y-up)."""
    shell = [
        [xmin, ymin],
        [xmin, ymax],
        [xmax, ymax],
        [xmax, ymin],
        [xmin, ymin],
    ]
    ring = np.array(shell, dtype=np.float64)
    return ring[::-1].copy() if hole else ring


def rect_feature(fid: int, xmin, ymin, xmax, ymax, hole=None, **attrs) -> PolygonFeature:
    rings = [rect_ring(xmin, ymin, xmax, ymax)]
    holes = [False]
    if hole is not None:
        rings.append(rect_ring(*hole, hole=True))
        holes.append(True)
    return PolygonFeature(fid=fid, rings=rings, holes=holes, attrs=attrs)


# ------------------------------------------------------------ fixture layers

# Oracle-friendly layer: axis-aligned rects (+ one hole) over the [0,1000)^2
# derived-coordinate domain. PIP for these under the reference's winding
# arithmetic is exactly the half-open box test (see tests/test_kernels.py
# TestPointInPoly), so a DuckDB oracle can express the join in pure SQL.
RECT_SPECS = [
    # fid, xmin, ymin, xmax, ymax, hole(xmin,ymin,xmax,ymax) or None
    (1, 100.0, 100.0, 400.0, 350.0, None),
    (2, 500.0, 450.0, 800.0, 900.0, (600.0, 550.0, 700.0, 700.0)),
    (3, 50.0, 600.0, 300.0, 950.0, None),
]


def rect_layer() -> list[PolygonFeature]:
    return [
        rect_feature(fid, xmin, ymin, xmax, ymax, hole=hole, zone=fid)
        for fid, xmin, ymin, xmax, ymax, hole in RECT_SPECS
    ]


def rect_layer_sql_predicate(x: str = "x", y: str = "y") -> str:
    """DuckDB predicate equivalent to membership in any rect_layer feature."""
    terms = []
    for _, xmin, ymin, xmax, ymax, hole in RECT_SPECS:
        t = f"({x} >= {xmin} AND {x} < {xmax} AND {y} >= {ymin} AND {y} < {ymax})"
        if hole:
            hx0, hy0, hx1, hy1 = hole
            t = (
                f"({t} AND NOT ({x} >= {hx0} AND {x} < {hx1} "
                f"AND {y} >= {hy0} AND {y} < {hy1}))"
            )
        terms.append(t)
    return "(" + " OR ".join(terms) + ")"


def rect_layer_fid_case(x: str = "x", y: str = "y") -> str:
    """DuckDB CASE returning the LAST matching feature fid (last-wins order).

    Features are disjoint in this fixture, so last-wins == only-match; the
    CASE enumerates in reverse layer order to mirror clip.rs last-hit-wins.
    """
    whens = []
    for fid, xmin, ymin, xmax, ymax, hole in reversed(RECT_SPECS):
        t = f"({x} >= {xmin} AND {x} < {xmax} AND {y} >= {ymin} AND {y} < {ymax})"
        if hole:
            hx0, hy0, hx1, hy1 = hole
            t = (
                f"({t} AND NOT ({x} >= {hx0} AND {x} < {hx1} "
                f"AND {y} >= {hy0} AND {y} < {hy1}))"
            )
        whens.append(f"WHEN {t} THEN {fid}")
    return "CASE " + " ".join(whens) + " ELSE NULL END"


def exotic_layer() -> list[PolygonFeature]:
    """Hand-made hard cases for pytest parity (concave, bowtie, multipart)."""
    c_poly = np.array(
        [[0, 0], [0, 30], [30, 30], [30, 20], [10, 20], [10, 10], [30, 10], [30, 0], [0, 0]],
        dtype=np.float64,
    )
    bow = np.array([[50, 50], [70, 70], [70, 50], [50, 70], [50, 50]], dtype=np.float64)
    multi_a = rect_ring(100, 0, 120, 20)
    multi_b = rect_ring(140, 0, 160, 20)
    multi_b_hole = rect_ring(145, 5, 155, 15, hole=True)
    return [
        PolygonFeature(1, [c_poly], [False], {"name": "cshape"}),
        PolygonFeature(2, [bow], [False], {"name": "bowtie"}),
        PolygonFeature(
            3, [multi_a, multi_b, multi_b_hole], [False, False, True], {"name": "multi"}
        ),
    ]


def layer_to_rows(layer: list[PolygonFeature]) -> list[dict]:
    """Relational form: one row per part."""
    rows = []
    for feat in layer:
        for part_num, (ring, hole) in enumerate(zip(feat.rings, feat.holes)):
            rows.append(
                dict(
                    fid=feat.fid,
                    part=part_num,
                    is_hole=bool(hole),
                    xs=[float(v) for v in ring[:, 0]],
                    ys=[float(v) for v in ring[:, 1]],
                    xmin=float(ring[:, 0].min()),
                    ymin=float(ring[:, 1].min()),
                    xmax=float(ring[:, 0].max()),
                    ymax=float(ring[:, 1].max()),
                    **feat.attrs,
                )
            )
    return rows


# ------------------------------------------------------------ line fixture

# Two deterministic polyline layers over the [0,1000)^2 domain for the
# line-ops family (LineIntersections etc.): (seg_id, x1, y1, x2, y2).
LINE_SPECS_1 = [
    (1, 50.0, 50.0, 950.0, 900.0),
    (2, 100.0, 800.0, 900.0, 100.0),
    (3, 0.0, 500.0, 1000.0, 500.0),
    (4, 480.0, 0.0, 520.0, 1000.0),
]
LINE_SPECS_2 = [
    (1, 0.0, 0.0, 1000.0, 1000.0),
    (2, 0.0, 1000.0, 1000.0, 0.0),
    (3, 250.0, 100.0, 250.0, 950.0),
    (4, 100.0, 250.0, 950.0, 250.0),
]


def line_layer_rows(specs) -> list[dict]:
    return [
        dict(seg_id=i, x1=x1, y1=y1, x2=x2, y2=y2) for i, x1, y1, x2, y2 in specs
    ]


def line_specs_sql(specs, name: str) -> str:
    vals = ", ".join(
        f"({i}, {x1!r}, {y1!r}, {x2!r}, {y2!r})" for i, x1, y1, x2, y2 in specs
    )
    return f"{name}(seg_id, x1, y1, x2, y2) AS (VALUES {vals})"


# Overlay partner layer: rects offset against RECT_SPECS so pairs overlap
# partially (clip windows are convex; disjoint within the layer).
RECT_SPECS_B = [
    (1, 200.0, 50.0, 550.0, 300.0, None),
    (2, 350.0, 500.0, 700.0, 800.0, None),
    (3, 100.0, 700.0, 260.0, 1000.0, None),
]


def rect_layer_b() -> list[PolygonFeature]:
    return [
        rect_feature(fid, xmin, ymin, xmax, ymax, hole=hole, zone=fid)
        for fid, xmin, ymin, xmax, ymax, hole in RECT_SPECS_B
    ]


# Multi-vertex polyline paths for the line-editing family.
LINE_PATHS = [
    dict(seg_id=1, xs=[0.0, 100.0, 220.0, 300.0, 450.0],
         ys=[0.0, 80.0, 60.0, 200.0, 180.0]),
    dict(seg_id=2, xs=[500.0, 600.0, 640.0, 800.0],
         ys=[900.0, 820.0, 700.0, 650.0]),
]


# Endpoint-sharing segments for MergeLineSegments: chains {1,2,3}, {4,5}, {6}.
MERGE_SEGS = [
    (1, 0.0, 0.0, 100.0, 50.0),
    (2, 100.0, 50.0, 200.0, 80.0),
    (3, 200.0, 80.0, 300.0, 90.0),
    (4, 500.0, 500.0, 600.0, 510.0),
    (5, 600.0, 510.0, 700.0, 530.0),
    (6, 50.0, 900.0, 120.0, 950.0),
]


# Touching rects for Dissolve's shared-boundary merge: fids 1|2 share the
# full edge x=100, fids 2|3 share y=100 over x in [100,200]; group 2's
# pair shares x=400. val is the dissolve attribute.
TOUCH_RECT_SPECS = [
    # fid, xmin, ymin, xmax, ymax, val
    (1, 0.0, 0.0, 100.0, 100.0, 1),
    (2, 100.0, 0.0, 200.0, 100.0, 1),
    (3, 100.0, 100.0, 200.0, 200.0, 1),
    (4, 300.0, 300.0, 400.0, 400.0, 2),
    (5, 400.0, 300.0, 500.0, 400.0, 2),
]


def touch_layer_rows() -> list[dict]:
    rows = []
    for fid, xmin, ymin, xmax, ymax, val in TOUCH_RECT_SPECS:
        ring = rect_ring(xmin, ymin, xmax, ymax)
        rows.append(
            dict(
                fid=fid, part=0, is_hole=False,
                xs=[float(v) for v in ring[:, 0]],
                ys=[float(v) for v in ring[:, 1]],
                val=val,
            )
        )
    return rows
