"""Multimodal (binary) columns: schema, synthesis, decode plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct,
exactly how a 100 TB multimodal corpus stores them next to text spans.
The decode / feature-extract step is a Pandas-UDF ``mapInPandas`` whose
Spark-side plumbing (schema, Arrow batching, partition mapping) is real
and tested; the actual image/audio decoding is STUBBED (the container has
no codec libraries) behind ``decoder=``: the default 'fake' decoder is a
deterministic byte-statistics extractor, and 'real' raises
NotImplementedError with the integration point documented.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def synth_media(docs: DataFrame, record: str = "doc_id") -> DataFrame:
    """Deterministic media table: payload = unhex(repeat(md5(ref), k)),
    k = 1 + doc_id % 7 -> 16*k bytes. All JVM-side; reproducible in any
    engine (the DuckDB oracle computes the same bytes)."""
    ref = F.concat(F.lit("m://"), F.col(record).cast("string"))
    k = (F.pmod(F.col(record), F.lit(7)) + 1).cast("int")
    hexstr = F.repeat(F.md5(ref), k)
    payload = F.unhex(hexstr)
    kind = F.when(F.pmod(F.col(record), F.lit(2)) == 0, F.lit("image")).otherwise(
        F.lit("audio")
    )
    return docs.select(
        F.col(record).alias("doc_id"),
        ref.alias("media_ref"),
        payload.alias("payload"),
        F.struct(
            kind.alias("kind"),
            (k * 16).alias("n_bytes"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("entropy8", T.DoubleType()),
    ]
)


def decode_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched media decode -> per-item features.

    decoder='fake': deterministic byte statistics (len, mean, max, 8-bin
    byte entropy) — exercises the full Spark plumbing.
    decoder='real': the integration point for actual codec libraries
    (PIL/ffmpeg), not available in this environment."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "real":
            raise NotImplementedError(
                "real media decoding requires codec libraries (PIL/ffmpeg); "
                "plug them in here — the Spark plumbing is identical"
            )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 5, minlength=8).astype(np.float64)
                p = hist / hist.sum()
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                out.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        float(arr.mean()),
                        int(arr.max()),
                        entropy,
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "mean_byte", "max_byte", "entropy8"]
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' plumbing: split each payload into fixed-size
    chunks (one row per frame) — the distributed shape of video frame
    extraction. Chunking is done in Arrow batches; real frame decode
    plugs into the same UDF."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, len(b), every_n_bytes):
                    rows.append((int(doc_id), i // every_n_bytes, b[i : i + every_n_bytes]))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.select("doc_id", "payload").mapInPandas(run, schema=schema)
