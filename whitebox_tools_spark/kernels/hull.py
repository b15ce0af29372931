"""Convex hull / minimum bounding box / smallest enclosing circle kernels.

Parity contracts:
- convex_hull (src/algorithms/convex_hull.rs:12-39): Graham scan; pivot =
  lowest y (rightmost on ties); sort by cross-product angle with the
  reference's collinear comparator; Left -> push, Ahead (collinear
  forward) -> replace top, else pop. CCW output starting at the pivot.
- minimum_bounding_box (src/algorithms/minimum_bounding_box.rs:28-160):
  rotate the hull to each hull edge's orientation around the bbox
  midpoint, take the axis-aligned box, minimize area/perimeter/length/
  width; returns 4 corners + (long_axis, short_axis, slope).
- smallest_enclosing_circle (src/algorithms/smallest_enclosing_circle.rs):
  Welzl's algorithm; the circle is UNIQUE so the reference's random
  shuffle does not affect the result — we use a deterministic order.
"""

from __future__ import annotations

import math

import numpy as np


def _find_pivot(pts: np.ndarray) -> int:
    lowest = 0
    for i in range(1, len(pts)):
        if pts[i, 1] < pts[lowest, 1] or (
            pts[i, 1] == pts[lowest, 1] and pts[i, 0] > pts[lowest, 0]
        ):
            lowest = i
    return lowest


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Graham scan transcription (convex_hull.rs). ``points``: (n, 2)."""
    pts = np.array(points, dtype=np.float64)
    piv = _find_pivot(pts)
    head = pts[piv].copy()
    rest = np.delete(pts, piv, axis=0)

    import functools

    def cmp(a, b):
        area = (a[0] - head[0]) * (b[1] - head[1]) - (b[0] - head[0]) * (a[1] - head[1])
        if area == 0.0:
            x = abs(a[0] - head[0]) - abs(b[0] - head[0])
            y = abs(a[1] - head[1]) - abs(b[1] - head[1])
            if x < 0.0 or y < 0.0:
                return -1
            if x > 0.0 or y > 0.0:
                return 1
            return 0
        return -1 if area > 0.0 else 1

    order = sorted(range(len(rest)), key=functools.cmp_to_key(lambda i, j: cmp(rest[i], rest[j])))
    seq = [head] + [rest[i] for i in order]

    hull = [seq[0], seq[1]]
    for i in range(2, len(seq)):
        while True:
            a, b, c = hull[-2], hull[-1], seq[i]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
            if cross > 0.0:  # Left
                hull.append(c)
                break
            if cross == 0.0:  # Ahead (collinear) -> replace top
                hull.pop()
                hull.append(c)
                break
            hull.pop()
            if len(hull) < 2:
                hull.append(c)
                break
    return np.array(hull)


def minimum_bounding_box(
    points: np.ndarray, criterion: str = "area"
) -> tuple[np.ndarray, float, float, float]:
    """Returns (4 corners, long_axis, short_axis, slope) — transcription
    of minimum_bounding_box.rs (criterion in area/perimeter/length/width)."""
    min_fn = {
        "area": lambda a, b: a * b,
        "perimeter": lambda a, b: 2.0 * a + 2.0 * b,
        "length": max,
        "width": min,
    }[criterion]
    hull = convex_hull(points)
    n = len(hull)
    east, west = hull[:, 0].max(), hull[:, 0].min()
    north, south = hull[:, 1].max(), hull[:, 1].min()
    midx = west + (east - west) / 2.0
    midy = south + (north - south) / 2.0

    right_angle = math.pi / 2.0
    x_axis = y_axis = 9999999.0
    slope = 0.0
    bcx = bcy = 0.0
    min_metric = math.inf
    for m in range(n - 1):
        psi = -math.atan2(hull[m + 1, 1] - hull[m, 1], hull[m + 1, 0] - hull[m, 0])
        xs = hull[:, 0] - midx
        ys = hull[:, 1] - midy
        xr = xs * math.cos(psi) - ys * math.sin(psi)
        yr = xs * math.sin(psi) + ys * math.cos(psi)
        new_x = abs(xr.max() - xr.min())
        new_y = abs(yr.max() - yr.min())
        metric = min_fn(new_x, new_y)
        if metric < min_metric:
            min_metric = metric
            x_axis, y_axis = new_x, new_y
            slope = -psi if x_axis > y_axis else -(right_angle + psi)
            x = xr.min() + x_axis / 2.0
            y = yr.max() - y_axis / 2.0
            bcx = midx + x * math.cos(-psi) - y * math.sin(-psi)
            bcy = midy + x * math.sin(-psi) + y * math.cos(-psi)

    long_axis = max(x_axis, y_axis)
    short_axis = min(x_axis, y_axis)
    ra = right_angle
    corners = np.array(
        [
            [
                bcx + long_axis / 2 * math.cos(slope) + short_axis / 2 * math.cos(ra + slope),
                bcy + long_axis / 2 * math.sin(slope) + short_axis / 2 * math.sin(ra + slope),
            ],
            [
                bcx + long_axis / 2 * math.cos(slope) - short_axis / 2 * math.cos(ra + slope),
                bcy + long_axis / 2 * math.sin(slope) - short_axis / 2 * math.sin(ra + slope),
            ],
            [
                bcx - long_axis / 2 * math.cos(slope) - short_axis / 2 * math.cos(ra + slope),
                bcy - long_axis / 2 * math.sin(slope) - short_axis / 2 * math.sin(ra + slope),
            ],
            [
                bcx - long_axis / 2 * math.cos(slope) + short_axis / 2 * math.cos(ra + slope),
                bcy - long_axis / 2 * math.sin(slope) + short_axis / 2 * math.sin(ra + slope),
            ],
        ]
    )
    return corners, long_axis, short_axis, slope


def smallest_enclosing_circle(points: np.ndarray) -> tuple[float, float, float]:
    """Welzl's algorithm (deterministic order; the optimum is unique).
    Returns (cx, cy, radius)."""
    pts = [tuple(p) for p in np.asarray(points, dtype=np.float64)]

    def circle_two(a, b):
        cx = (a[0] + b[0]) / 2.0
        cy = (a[1] + b[1]) / 2.0
        r = math.hypot(a[0] - cx, a[1] - cy)
        return (cx, cy, r)

    def circle_three(a, b, c):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0.0:
            return None
        ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
              + (cx * cx + cy * cy) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
              + (cx * cx + cy * cy) * (bx - ax)) / d
        return (ux, uy, math.hypot(ax - ux, ay - uy))

    def contains(circ, p, eps=1e-10):
        return math.hypot(p[0] - circ[0], p[1] - circ[1]) <= circ[2] + eps

    circ = None
    for i, p in enumerate(pts):
        if circ is None or not contains(circ, p):
            circ = (p[0], p[1], 0.0)
            for j, q in enumerate(pts[: i + 1]):
                if not contains(circ, q):
                    circ = circle_two(p, q)
                    for k, r_ in enumerate(pts[: j + 1]):
                        if not contains(circ, r_):
                            c3 = circle_three(p, q, r_)
                            if c3 is not None:
                                circ = c3
    return circ
