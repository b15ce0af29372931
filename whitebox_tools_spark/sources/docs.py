"""Interleaved text+media document table: synthesis + span invariants.

Input contract (BASELINE.json input_hint):

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string, media_ref:string,
                             offset:int>>)

Everything is generated with JVM-side higher-order functions
(``sequence`` + ``transform``) — zero Python in the generation path, so
synthesis scales to any SF as a narrow ``spark.range`` pipeline.

The *span-sequence invariant* (the per-row parity rule vs the reference:
every pipeline output must preserve each document's ordered
(kind, text, media_ref) sequence) is enforced via ``span_signature`` — a
canonical sha256 over the offset-ordered span sequence, again computed
entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# deterministic LCG mixes for span structure (independent of derive.py's)
_A_NS, _B_NS = 1_103_515_245, 12_345
_A_KIND, _B_KIND = 69_069, 362_437
_M31 = 2_147_483_648


def _mix(e: Column, a: int, b: int) -> Column:
    return F.pmod(F.pmod(e, F.lit(_M31)) * F.lit(a) + F.lit(b), F.lit(_M31))


def synth_docs(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Deterministic interleaved docs table (seed-free arithmetic synth).

    doc i: 1 + (mix(i) % 6) spans; span j: kind = 'media' iff
    mix(i*7+j) % 3 == 0; text/media_ref are null for the other kind;
    offset = j*16 + mix(i*7+j) % 16 (strictly increasing within a doc).
    """
    rng = spark.range(0, n_docs, numPartitions=partitions)
    i = F.col("id")
    return rng.select(
        F.format_string("doc-%012d", i).alias("doc_id"),
        i.alias("doc_num"),
        spans_col(i).alias("spans"),
    )


def spans_col(i: Column) -> Column:
    """The span array for document number ``i`` — the same arithmetic as
    :func:`synth_docs`, factored so spans can attach to ANY id column
    (e.g. the driver's documents.doc_id) and be transcribed in SQL."""
    n_spans = (_mix(i, _A_NS, _B_NS) % 6 + 1).cast("int")

    def span(j: Column):
        hij = _mix(i * 7 + j, _A_KIND, _B_KIND)
        is_media = hij % 3 == 0
        return F.struct(
            F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.when(~is_media, F.concat(F.lit("t-"), i, F.lit("-"), j)).alias("text"),
            F.when(is_media, F.concat(F.lit("m://"), i, F.lit("/"), j)).alias(
                "media_ref"
            ),
            (j * 16 + hij % 16).cast("int").alias("offset"),
        )

    return F.transform(F.sequence(F.lit(0), n_spans - 1), span)


def span_signature(spans: Column | str = "spans") -> Column:
    """Canonical sha256 of the offset-ordered (kind, text, media_ref) seq.

    ``array_sort`` on the span structs orders by struct fields left-to-right;
    we re-project to put offset first so ordering is by offset, then fold
    the sequence into one delimited string and hash it. All JVM-side.
    """
    c = F.col(spans) if isinstance(spans, str) else spans
    ordered = F.array_sort(
        F.transform(
            c,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    flat = F.array_join(
        F.transform(
            ordered,
            lambda s: F.concat_ws(
                "\x1f",
                s["kind"],
                F.coalesce(s["text"], F.lit("\x00")),
                F.coalesce(s["media_ref"], F.lit("\x00")),
            ),
        ),
        "\x1e",
    )
    return F.sha2(flat, 256)


def span_flat(spans: Column | str = "spans") -> Column:
    """The canonical offset-ordered delimited string itself (pre-hash) —
    used where the comparison should see the sequence content, e.g. the
    driver's span_invariant oracle row."""
    c = F.col(spans) if isinstance(spans, str) else spans
    ordered = F.array_sort(
        F.transform(
            c,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    return F.array_join(
        F.transform(
            ordered,
            lambda s: F.concat_ws(
                "\x1f",
                s["kind"],
                F.coalesce(s["text"], F.lit("\x00")),
                F.coalesce(s["media_ref"], F.lit("\x00")),
            ),
        ),
        "\x1e",
    )


def check_span_equality(source: DataFrame, output: DataFrame, key: str = "doc_id") -> int:
    """Number of documents whose span sequence was NOT preserved.

    Joins on ``key`` and compares canonical signatures; 0 == invariant holds.
    Documents absent from ``output`` are not violations (filters are allowed
    to drop docs, never to reorder/mutate spans).
    """
    s = source.select(F.col(key), span_signature().alias("sig_src"))
    o = output.select(F.col(key), span_signature().alias("sig_out"))
    return o.join(s, key).where(F.col("sig_src") != F.col("sig_out")).count()
