"""General polygon boolean kernel (Greiner-Hormann) for the overlay
family's GEOMETRY output (reference contract: gis_analysis/intersect.rs
:27-44 attribute merge + :928 part splitting; union.rs; clip.rs:462-560;
erase.rs). The reference stitches rings inside its own sweep structures;
this kernel is an independent from-scratch implementation of the
published Greiner-Hormann algorithm (Greiner & Hormann, ACM TOG 17(2),
1998) operating on simple hole-free rings.

Scope / conventions:
- inputs: open rings (first vertex NOT repeated), any winding;
- ops: "int" (A&B), "diff" (A-B), "union" (A|B);
- outputs: list of (ring ndarray, is_hole) with every ring canonical:
  CCW winding, rotated to start at the lexicographically smallest
  (x, y) vertex, closing vertex dropped;
- degenerate contacts (shared edges, vertex-on-edge) are out of scope
  (the reference's fixtures avoid them; a perturbation pass would be
  the standard extension);
- polygons WITH holes are handled by the callers as even-odd ring
  sets: op(shell) rings plus op(hole) rings flagged is_hole — exact
  because every hole is contained in its shell.
"""

from __future__ import annotations

import numpy as np

from whitebox_tools_spark.kernels.geometry import point_in_poly, polygon_area


class _V:
    __slots__ = (
        "x", "y", "nxt", "prv", "inter", "entry", "neigh", "alpha", "done"
    )

    def __init__(self, x: float, y: float, inter: bool = False, alpha: float = 0.0):
        self.x = x
        self.y = y
        self.nxt = None
        self.prv = None
        self.inter = inter
        self.entry = True
        self.neigh = None
        self.alpha = alpha
        self.done = False


def _build(ring: np.ndarray) -> _V:
    first = None
    prev = None
    for x, y in ring:
        v = _V(float(x), float(y))
        if first is None:
            first = v
        else:
            prev.nxt = v
            v.prv = prev
        prev = v
    prev.nxt = first
    first.prv = prev
    return first


def _verts(head: _V):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _insert(v: _V, a: _V, b: _V) -> None:
    """Insert intersection vertex between edge endpoints a..b, keeping
    alpha order among already-inserted intersections on that edge."""
    c = a
    while c.nxt is not b and c.nxt.inter and c.nxt.alpha < v.alpha:
        c = c.nxt
    nxt = c.nxt
    v.prv = c
    v.nxt = nxt
    c.nxt = v
    nxt.prv = v


def _edge_pairs(head: _V):
    """(start, end) per original edge — ends are non-intersection nodes."""
    orig = [v for v in _verts(head) if not v.inter]
    n = len(orig)
    for i in range(n):
        yield orig[i], orig[(i + 1) % n]


def _intersections(s_head: _V, c_head: _V) -> int:
    count = 0
    for sa, sb in list(_edge_pairs(s_head)):
        for ca, cb in list(_edge_pairs(c_head)):
            rx, ry = sb.x - sa.x, sb.y - sa.y
            sx, sy = cb.x - ca.x, cb.y - ca.y
            denom = rx * sy - ry * sx
            if denom == 0.0:
                continue
            qpx, qpy = ca.x - sa.x, ca.y - sa.y
            t = (qpx * sy - qpy * sx) / denom
            u = (qpx * ry - qpy * rx) / denom
            if 0.0 < t < 1.0 and 0.0 < u < 1.0:
                ix, iy = sa.x + t * rx, sa.y + t * ry
                vs = _V(ix, iy, inter=True, alpha=t)
                vc = _V(ix, iy, inter=True, alpha=u)
                vs.neigh = vc
                vc.neigh = vs
                _insert(vs, sa, sb)
                _insert(vc, ca, cb)
                count += 1
    return count


def _mark(head: _V, other_ring: np.ndarray, invert: bool) -> None:
    inside = bool(
        point_in_poly(np.array([head.x]), np.array([head.y]), other_ring)[0]
    )
    status = not inside  # next crossing ENTERS when we start outside
    if invert:
        status = not status
    for v in _verts(head):
        if v.inter:
            v.entry = status
            status = not status


def _close(ring: np.ndarray) -> np.ndarray:
    return np.vstack([ring, ring[:1]])


def _signed_area(ring: np.ndarray) -> float:
    """Signed shoelace area of an open ring (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0


def canonical(ring: np.ndarray) -> np.ndarray:
    """CCW winding, start at lexicographically smallest (x, y)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and (r[0] == r[-1]).all():
        r = r[:-1]
    if polygon_area(r) != 0.0:
        x, y = r[:, 0], r[:, 1]
        signed = np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
        if signed < 0:
            r = r[::-1]
    k = np.lexsort((r[:, 1], r[:, 0]))[0]
    return np.roll(r, -k, axis=0)


def gh_clip(
    subj: np.ndarray, clip: np.ndarray, op: str
) -> list[tuple[np.ndarray, bool]]:
    """Boolean of two simple hole-free rings. op: 'int' | 'diff' | 'union'."""
    subj = np.asarray(subj, dtype=np.float64)
    clip = np.asarray(clip, dtype=np.float64)
    if len(subj) > 1 and (subj[0] == subj[-1]).all():
        subj = subj[:-1]
    if len(clip) > 1 and (clip[0] == clip[-1]).all():
        clip = clip[:-1]
    # normalize both inputs to CCW so the traversal direction of traced
    # rings is meaningful (union void rings come out CW, see below)
    if _signed_area(subj) < 0.0:
        subj = subj[::-1]
    if _signed_area(clip) < 0.0:
        clip = clip[::-1]
    s_head = _build(subj)
    c_head = _build(clip)
    n_int = _intersections(s_head, c_head)

    if n_int == 0:
        s_in_c = bool(
            point_in_poly(np.array([subj[0, 0]]), np.array([subj[0, 1]]), _close(clip))[0]
        )
        c_in_s = bool(
            point_in_poly(np.array([clip[0, 0]]), np.array([clip[0, 1]]), _close(subj))[0]
        )
        if op == "int":
            if s_in_c:
                return [(canonical(subj), False)]
            if c_in_s:
                return [(canonical(clip), False)]
            return []
        if op == "diff":
            if s_in_c:
                return []
            if c_in_s:
                return [(canonical(subj), False), (canonical(clip), True)]
            return [(canonical(subj), False)]
        # union
        if s_in_c:
            return [(canonical(clip), False)]
        if c_in_s:
            return [(canonical(subj), False)]
        return [(canonical(subj), False), (canonical(clip), False)]

    # entry/exit marking per the G-H op table: intersection as computed,
    # union inverts both, difference (A-B) inverts the SUBJECT side only
    _mark(s_head, _close(clip), invert=(op != "int"))
    _mark(c_head, _close(subj), invert=(op == "union"))

    out: list[tuple[np.ndarray, bool]] = []
    inters = [v for v in _verts(s_head) if v.inter]
    for start in inters:
        if start.done:
            continue
        ring = []
        cur = start
        while True:
            cur.done = True
            if cur.neigh is not None:
                cur.neigh.done = True
            if cur.entry:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.inter:
                        break
            else:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.inter:
                        break
            cur = cur.neigh
            if cur is start or (cur.neigh is start):
                break
            if cur.done:
                break
        r = np.array(ring, dtype=np.float64)
        if len(r) >= 3 and polygon_area(r) > 0.0:
            out.append((canonical(r), False))
    if op == "union" and len(out) > 1:
        # A|B with crossings is CONNECTED, so exactly one traced ring is
        # the outer shell and the rest are enclosed voids (e.g. a U-shape
        # capped by a bar). Winding can't discriminate (the G-H union
        # traversal emits shell and void with the same orientation), so
        # classify by containment in the largest ring.
        shell_i = max(range(len(out)), key=lambda i: polygon_area(out[i][0]))
        shell = _close(out[shell_i][0])
        out = [
            (
                r,
                i != shell_i
                and bool(
                    point_in_poly(
                        np.array([r[0, 0]]), np.array([r[0, 1]]), shell
                    )[0]
                ),
            )
            for i, (r, _) in enumerate(out)
        ]
    return out


def diff_ringset(
    pieces: list[tuple[np.ndarray, bool]], clips: list[np.ndarray]
) -> list[tuple[np.ndarray, bool]]:
    """Even-odd ring set (shell pieces + holes) minus every clip ring:
    sequential fold; holes produced by a fully-contained clip are kept
    and reduced by later clips under the even-odd reading."""
    for c in clips:
        nxt: list[tuple[np.ndarray, bool]] = []
        for ring, is_hole in pieces:
            if is_hole:
                # hole' = hole - clip (even-odd exact, hole in shell);
                # a clip fully inside the hole changes nothing, so
                # hole-in-hole rings are dropped, not re-flagged
                for r, h in gh_clip(ring, c, "diff"):
                    if not h:
                        nxt.append((r, True))
            else:
                nxt.extend(gh_clip(ring, c, "diff"))
        pieces = nxt
    return pieces


def diff_many(
    shell: np.ndarray, clips: list[np.ndarray]
) -> list[tuple[np.ndarray, bool]]:
    """shell minus every clip ring."""
    return diff_ringset([(np.asarray(shell, np.float64), False)], clips)
