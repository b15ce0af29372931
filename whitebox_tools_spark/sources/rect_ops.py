"""Independent closed-form boolean of two axis-aligned rectangles —
the ORACLE-side generator for the overlay-geometry queries.

Deliberately a different algorithm family from the engine's
Greiner-Hormann kernel (kernels/clip.py): the plane is cut into the
<= 3x3 cell grid induced by the two rects' coordinates, cells are
classified by rect membership under the boolean op, and boundary rings
are extracted by directed-edge chaining (filled region on the left =>
shells CCW, holes CW) with collinear-run merging. Every output
coordinate is one of the eight input coordinates, so results are exact
and can be inlined as SQL VALUES literals.
"""

from __future__ import annotations

import numpy as np

Rect = tuple[float, float, float, float]  # x0, y0, x1, y1


def region_rings(rects: list[Rect], member) -> list[tuple[np.ndarray, bool]]:
    """Canonical rings of the region {p : member(inside flags at p)} on
    the grid induced by all rect coordinates. ``member`` maps a tuple of
    per-rect containment booleans to filled/empty."""
    xs = sorted({v for r in rects for v in (r[0], r[2])})
    ys = sorted({v for r in rects for v in (r[1], r[3])})

    filled = {}
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            mx = (xs[i] + xs[i + 1]) / 2.0
            my = (ys[j] + ys[j + 1]) / 2.0
            flags = tuple(
                r[0] < mx < r[2] and r[1] < my < r[3] for r in rects
            )
            filled[(i, j)] = bool(member(flags))

    # directed boundary edges, filled cell on the LEFT
    edges: dict[tuple[float, float], tuple[float, float]] = {}

    def f(i: int, j: int) -> bool:
        return filled.get((i, j), False)

    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            if not f(i, j):
                continue
            x0, x1 = xs[i], xs[i + 1]
            y0, y1 = ys[j], ys[j + 1]
            if not f(i, j - 1):
                edges[(x0, y0)] = (x1, y0)  # bottom: rightward
            if not f(i + 1, j):
                edges[(x1, y0)] = (x1, y1)  # right: upward
            if not f(i, j + 1):
                edges[(x1, y1)] = (x0, y1)  # top: leftward
            if not f(i - 1, j):
                edges[(x0, y1)] = (x0, y0)  # left: downward

    rings: list[tuple[np.ndarray, bool]] = []
    while edges:
        start = next(iter(edges))
        pts = [start]
        cur = edges.pop(start)
        while cur != start:
            pts.append(cur)
            cur = edges.pop(cur)
        r = np.array(pts, dtype=np.float64)
        # merge collinear runs (axis-aligned: drop vertices where the
        # direction does not change)
        keep = []
        n = len(r)
        for k in range(n):
            p, q, s = r[k - 1], r[k], r[(k + 1) % n]
            if not ((p[0] == q[0] == s[0]) or (p[1] == q[1] == s[1])):
                keep.append(k)
        r = r[keep]
        x, y = r[:, 0], r[:, 1]
        signed = np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
        is_hole = signed < 0
        if is_hole:
            r = r[::-1]
        k = np.lexsort((r[:, 1], r[:, 0]))[0]
        rings.append((np.roll(r, -k, axis=0), bool(is_hole)))
    rings.sort(key=lambda rh: (rh[1], rh[0][0, 0], rh[0][0, 1]))
    return rings


def rect_bool_rings(a: Rect, b: Rect, op: str) -> list[tuple[np.ndarray, bool]]:
    """Canonical rings of op(a, b); is_hole for enclosed empty regions."""
    ops = {
        "int": lambda f: f[0] and f[1],
        "diff": lambda f: f[0] and not f[1],
        "union": lambda f: f[0] or f[1],
    }
    return region_rings([a, b], ops[op])
