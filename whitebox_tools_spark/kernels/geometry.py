"""Planar geometry kernels with reference-exact semantics.

Parity contracts (reference: geoinfobyran/whitebox-tools):
- ``winding_number`` / ``point_in_poly``: src/algorithms/poly_ops.rs:41-72 /
  :30-33 — winding number taken mod 2 (even-odd rule); points exactly on an
  edge are OUTSIDE; ring must be closed (first == last vertex).
- ``is_clockwise_order``: src/algorithms/is_clockwise_order.rs (Paul Bourke
  method); a polygon part is a hole iff counter-clockwise
  (src/vector/shapefile/geometry.rs:305+).
- ``polygon_area``: src/algorithms/poly_area.rs:12-25 (shoelace, abs/2).
- ``points_in_polygon_feature``: shell-then-hole membership of
  src/tools/lidar_analysis/clip_lidar_to_polygon.rs:264-310.

All functions are vectorized over the *point* axis (numpy broadcasting over
ring edges); this is the exact code that runs inside the engine's Arrow
pandas UDFs, so tests on these functions ARE tests of the Spark path.
"""

from __future__ import annotations

import numpy as np


def _close_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if ring.ndim != 2 or ring.shape[1] != 2:
        raise ValueError("ring must be (n, 2)")
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return ring


def winding_number(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Winding number of each point w.r.t. a closed ring (vectorized).

    Identical f64 arithmetic to the reference's is_left/winding loop:
    upward crossing counts +1 iff point strictly left; downward crossing
    counts -1 iff point strictly right.
    """
    ring = _close_ring(ring)
    px = np.asarray(px, dtype=np.float64)[:, None]  # (n, 1)
    py = np.asarray(py, dtype=np.float64)[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]  # (1, e)
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]

    # is_left(p0, p1, p) = (x1-x0)*(py-y0) - (px-x0)*(y1-y0)
    is_left = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)

    up = (y0 <= py) & (y1 > py) & (is_left > 0.0)
    down = (y0 > py) & (y1 <= py) & (is_left < 0.0)
    return (up.astype(np.int64) - down.astype(np.int64)).sum(axis=1)


def point_in_poly(px, py, ring) -> np.ndarray:
    """Even-odd PIP; boundary points are OUTSIDE (poly_ops.rs:26-33)."""
    return winding_number(px, py, ring) % 2 != 0


def is_clockwise_order(ring: np.ndarray) -> bool:
    """True iff the ring vertices are in clockwise order.

    Signed-area formulation of the Bourke test used by the reference
    (is_clockwise_order.rs: convex -> cross-product sign, concave ->
    polygon area sign; the area sign alone is equivalent for simple
    rings, negative shoelace sum => clockwise in a y-up frame).
    """
    ring = np.asarray(ring, dtype=np.float64)
    if (ring[0] == ring[-1]).all():
        ring = ring[:-1]
    if len(ring) < 3:
        return False
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(np.sum(x * y2 - x2 * y)) < 0.0


def polygon_area(ring: np.ndarray) -> float:
    """Unsigned shoelace area (poly_area.rs:12-25)."""
    ring = _close_ring(ring)
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return abs(float(np.sum(x * y2 - x2 * y))) / 2.0


def polygon_perimeter(ring: np.ndarray) -> float:
    """Sum of edge lengths of the closed ring (poly_perimeter.rs)."""
    ring = _close_ring(ring)
    d = np.diff(ring, axis=0)
    return float(np.sqrt((d**2).sum(axis=1)).sum())


def points_in_polygon_feature(
    px: np.ndarray,
    py: np.ndarray,
    rings: list[np.ndarray],
    holes: list[bool],
    mode: str = "shell_then_hole",
) -> np.ndarray:
    """Membership of points in a multi-part polygon feature.

    mode='shell_then_hole' (ClipLidarToPolygon semantics,
    clip_lidar_to_polygon.rs:264-310): inside iff inside any shell ring
    AND not inside any hole ring.

    mode='last_wins' (Clip point-mode semantics, clip.rs:303-317): parts
    are tested in order; a shell hit sets inside=true, a hole hit sets
    inside=false; the LAST matching part wins.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if mode == "shell_then_hole":
        inside = np.zeros(len(px), dtype=bool)
        for ring, hole in zip(rings, holes):
            if not hole:
                inside |= point_in_poly(px, py, ring)
        for ring, hole in zip(rings, holes):
            if hole:
                inside &= ~point_in_poly(px, py, ring)
        return inside
    if mode == "last_wins":
        inside = np.zeros(len(px), dtype=bool)
        for ring, hole in zip(rings, holes):
            hit = point_in_poly(px, py, ring)
            inside = np.where(hit, not hole, inside)
        return inside
    raise ValueError(f"unknown mode {mode!r}")


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull, CCW order (convex_hull.rs)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(iterable):
        out: list[np.ndarray] = []
        for p in iterable:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])
