"""Hypothesis property tests for the round-2 machinery.

Each property pits a Spark implementation against an independent plain-
Python brute force on randomized small inputs — the angles the fixture
oracles can't sweep (weird float reprs, quote-bearing strings, random
rect adjacency, random token overlap patterns).
"""

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from whitebox_tools_spark.localrel import local_df

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            finite_floats,
            st.text(min_size=0, max_size=12),
            st.lists(finite_floats, min_size=0, max_size=4),
            st.booleans(),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_local_df_round_trips_values(spark, rows):
    df = local_df(spark, rows, columns=["i", "f", "s", "arr", "b"])
    got = sorted(
        (r.i, r.f, r.s, tuple(r.arr), r.b) for r in df.collect()
    )
    want = sorted((i, f, s, tuple(a), b) for i, f, s, a, b in rows)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert g[1] == w[1] or (math.isnan(g[1]) and math.isnan(w[1]))
        assert g[2] == w[2]
        assert g[3] == w[3]
        assert g[4] == w[4]


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
        min_size=2,
        max_size=8,
    )
)
def test_minhash_candidates_exactly_once(spark, docs):
    """Candidate pairs equal the brute-force banded-LSH pair set, each
    emitted exactly once (no duplicates from multi-band matches)."""
    from whitebox_tools_spark.operators import text as tx

    rows = [dict(doc_id=i, text=" ".join(toks)) for i, toks in enumerate(docs)]
    df = local_df(spark, rows)
    got = [(r.a, r.b) for r in tx.minhash_candidates(df).collect()]
    assert len(got) == len(set(got)), "pair emitted more than once"

    # brute force: recompute signatures via the engine expression, then
    # band in plain Python
    sig = {
        r.doc_id: tuple(r.mh)
        for r in tx.with_minhash(df).select(
            "doc_id", F.col("minhash").alias("mh")
        ).collect()
    }
    want = set()
    ids = sorted(sig)
    for i in ids:
        for j in ids:
            if i < j and any(a == b for a, b in zip(sig[i], sig[j])):
                want.add((i, j))
    assert set(got) == want


@settings(**_SETTINGS)
@given(
    rects=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=1, max_value=2),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_dissolve_geometry_matches_counter(spark, rects):
    """Edge-cancellation dissolve equals a plain-Python Counter over the
    same canonical edges, for random grid-snapped (possibly adjacent,
    possibly duplicated) rectangles."""
    from whitebox_tools_spark.operators.vector_ops import dissolve_geometry

    rows = []
    per_key = {}
    for fid, (x0, y0, w, h, val) in enumerate(rects):
        xs = [x0, x0, x0 + w, x0 + w, x0]
        ys = [y0, y0 + h, y0 + h, y0, y0]
        rows.append(
            dict(fid=fid, part=0, is_hole=False,
                 xs=[float(v) for v in xs], ys=[float(v) for v in ys], val=val)
        )
        c = per_key.setdefault(val, Counter())
        for i in range(4):
            a = (float(xs[i]), float(ys[i]))
            b = (float(xs[i + 1]), float(ys[i + 1]))
            c[(a, b) if a <= b else (b, a)] += 1
    want = {
        (val, a[0], a[1], b[0], b[1])
        for val, c in per_key.items()
        for (a, b), n in c.items()
        if n == 1
    }
    out = dissolve_geometry(local_df(spark, rows), "val").collect()
    got = {(r.key, r.x1, r.y1, r.x2, r.y2) for r in out}
    assert got == want


@settings(**_SETTINGS)
@given(
    rect=st.tuples(
        finite_floats.filter(lambda v: abs(v) < 1e6),
        finite_floats.filter(lambda v: abs(v) < 1e6),
        st.floats(min_value=1.0, max_value=1e3),
        st.floats(min_value=1.0, max_value=1e3),
    ),
    d=st.floats(min_value=0.5, max_value=50.0),
)
def test_buffer_ring_vertices_at_distance(spark, rect, d):
    """Every buffered-outline vertex lies exactly ``d`` from the source
    rectangle boundary (up to float round-off)."""
    from whitebox_tools_spark.operators.misc6 import buffer_vector_geometry

    x0, y0, w, h = rect
    xs = [x0, x0, x0 + w, x0 + w, x0]
    ys = [y0, y0 + h, y0 + h, y0, y0]
    layer = local_df(
        spark,
        [dict(fid=1, part=0, is_hole=False,
              xs=[float(v) for v in xs], ys=[float(v) for v in ys])],
    )
    rows = buffer_vector_geometry(layer, float(d), arc_segments=3).collect()
    assert rows
    for r in rows:
        dx = max(x0 - r.x, 0.0, r.x - (x0 + w))
        dy = max(y0 - r.y, 0.0, r.y - (y0 + h))
        assert math.isclose(math.hypot(dx, dy), d, rel_tol=1e-9, abs_tol=1e-6)


def test_local_df_large_fallback(spark):
    """Past the SQL-literal row cap local_df falls back to a regular
    DataFrame with identical content."""
    rows = [dict(i=i, v=float(i) * 0.5) for i in range(4500)]
    df = local_df(spark, rows)
    assert df.count() == 4500
    got = {r.i: r.v for r in df.collect()}
    assert got[4499] == 4499 * 0.5 and got[0] == 0.0
