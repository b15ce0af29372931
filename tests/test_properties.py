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


# ------------------------------------------------- round-5 closing lanes

_words = st.sampled_from(["a", "b", "c", "aa", "ab"])
_docs_strategy = st.lists(
    st.lists(_words, min_size=0, max_size=18).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(**_SETTINGS)
@given(texts=_docs_strategy, k=st.integers(min_value=2, max_value=4))
def test_dup_spans_matches_bruteforce(spark, texts, k):
    """dup_spans vs a plain-Python sweep: positional k-shingle
    occurrence counting + island merge, on tiny random corpora with a
    5-word vocabulary (dense collisions by construction)."""
    from whitebox_tools_spark.operators import text as tx

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = local_df(spark, rows, columns=["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_shingles)
        for r in tx.dup_spans(docs, k=k).collect()
    )
    # brute force
    occ = Counter()
    per_doc = {}
    for i, t in rows:
        toks = t.split(" ")
        pos = []
        for p in range(len(toks) - k + 1):
            sh = tuple(toks[p:p + k])
            occ[sh] += 1
            pos.append((p + 1, sh))
        per_doc[i] = pos
    want = []
    for i, pos in per_doc.items():
        dup = [p for p, sh in pos if occ[sh] > 1]
        run = []
        for p in dup:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    want.append((i, run[0], run[-1] + k - 1,
                                 run[-1] + k - 1 - run[0] + 1, len(run)))
                run = [p]
        if run:
            want.append((i, run[0], run[-1] + k - 1,
                         run[-1] + k - 1 - run[0] + 1, len(run)))
    assert got == sorted(want)


@settings(**_SETTINGS)
@given(texts=_docs_strategy)
def test_bm25_matches_bruteforce(spark, texts):
    """bm25_scores vs plain-Python BM25/TF-IDF on random corpora."""
    from whitebox_tools_spark.operators import text as tx

    terms = ["a", "ab", "zz"]
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = local_df(spark, rows, columns=["doc_id", "text"])
    got = {r.doc_id: r for r in tx.bm25_scores(docs, terms).collect()}
    n = len(rows)
    toks = {i: t.split(" ") for i, t in rows}
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    for i, _ in rows:
        dl = len(toks[i])
        bm = ti = 0.0
        for t in terms:
            tf = toks[i].count(t)
            df = dfs[t]
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            bm += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
            if tf > 0:
                ti += tf * math.log(n / df)
        assert got[i].n_tokens == dl
        assert math.isclose(got[i].bm25, bm, rel_tol=0, abs_tol=1e-10)
        assert math.isclose(got[i].tfidf, ti, rel_tol=0, abs_tol=1e-10)


@settings(**_SETTINGS)
@given(texts=_docs_strategy)
def test_bigram_lm_matches_bruteforce(spark, texts):
    """bigram_lm_scores vs plain-Python add-one bigram LM."""
    from whitebox_tools_spark.operators import text as tx

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = local_df(spark, rows, columns=["doc_id", "text"])
    got = {r.doc_id: r for r in tx.bigram_lm_scores(docs).collect()}
    bic = Counter()
    vocab = set()
    toks = {i: t.split(" ") for i, t in rows}
    for v in toks.values():
        vocab.update(v)
        for a, b in zip(v, v[1:]):
            bic[(a, b)] += 1
    pre = Counter()
    for (a, _b), c in bic.items():
        pre[a] += c
    V = len(vocab)
    for i, _ in rows:
        v = toks[i]
        if len(v) < 2:
            assert i not in got
            continue
        lp = [math.log((bic[(a, b)] + 1.0) / (pre[a] + V))
              for a, b in zip(v, v[1:])]
        s = 0.0
        for x in lp:
            s += x
        assert got[i].n_bigrams == len(lp)
        assert math.isclose(got[i].avg_logp, s / len(lp),
                            rel_tol=0, abs_tol=1e-10)
