"""Multimodal (binary) columns: schema, synthesis, decode plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct,
exactly how a 100 TB multimodal corpus stores them next to text spans.
The decode / feature-extract step is a Pandas-UDF ``mapInPandas`` whose
Spark-side plumbing (schema, Arrow batching, partition mapping) is real
and tested. The 'real' decode lane has one dependency-free codec — a
pure-numpy 24-bit BMP parser (:func:`decode_bmp`) — so the end-to-end
image path (encode -> binary column -> Arrow batch -> decode ->
per-channel features) is genuinely exercised; formats that need native
libraries (JPEG/PNG/ffmpeg) still raise NotImplementedError at the
documented integration point.
"""

from __future__ import annotations

import struct
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


# --------------------------------------------------------------- BMP codec
# Pure-numpy 24-bit uncompressed BMP (BITMAPINFOHEADER): the one image
# format the 'real' decode lane can parse without native libraries.


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes (bottom-up, BGR, 4-byte row pad)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. 24-bit uncompressed only;
    top-down (negative height) files handled."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (off,) = struct.unpack_from("<I", data, 10)
    _, w, h = struct.unpack_from("<Iii", data, 14)
    bpp, = struct.unpack_from("<H", data, 28)
    (comp,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, count=h * row_size, offset=off).reshape(
        h, row_size
    )
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if bottom_up else img).copy()


def synth_bmp_media(docs: DataFrame, record: str = "doc_id") -> DataFrame:
    """Deterministic BMP media table: per doc, a (2 + id%4) x (2 + id%6)
    RGB image with pixel[r,c,ch] = (id*7 + r*13 + c*29 + ch*57) % 256 —
    closed-form, so a SQL oracle can recompute every channel mean. BMP
    bytes are built executor-side in Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[record]:
                did = int(did)
                w, h = 2 + did % 6, 2 + did % 4
                r_idx = np.arange(h, dtype=np.int64)[:, None, None]
                c_idx = np.arange(w, dtype=np.int64)[None, :, None]
                ch_idx = np.arange(3, dtype=np.int64)[None, None, :]
                img = ((did * 7 + r_idx * 13 + c_idx * 29 + ch_idx * 57) % 256
                       ).astype(np.uint8)
                payload = encode_bmp(img)
                rows.append((
                    did,
                    f"bmp://{did}",
                    payload,
                    {"kind": "image", "n_bytes": len(payload), "codec": "bmp"},
                ))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "media_ref", "payload", "meta"]
                )

    return docs.select(record).mapInPandas(run, schema=MEDIA_SCHEMA)


_IMG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def decode_image_features(media: DataFrame) -> DataFrame:
    """The REAL decode lane: parse each payload by meta.codec and emit
    per-channel image features. codec='bmp' decodes with the pure-numpy
    parser; any other codec raises NotImplementedError at this exact
    point — swap in PIL/ffmpeg here, the Spark plumbing is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                codec = meta["codec"]
                if codec != "bmp":
                    raise NotImplementedError(
                        f"real decode for codec {codec!r} requires native "
                        "libraries (PIL/ffmpeg); plug them in here"
                    )
                img = decode_bmp(bytes(payload))
                out.append((
                    int(doc_id), img.shape[1], img.shape[0],
                    float(img[:, :, 0].mean()),
                    float(img[:, :, 1].mean()),
                    float(img[:, :, 2].mean()),
                ))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["doc_id", "width", "height",
                             "mean_r", "mean_g", "mean_b"],
                )

    return media.select("doc_id", "payload", "meta").mapInPandas(
        run, schema=_IMG_FEATURE_SCHEMA
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
                "byte-level 'real' decoding: use decode_image_features for "
                "images (BMP is supported dependency-free); other codecs "
                "require native libraries (PIL/ffmpeg) — plug them in here"
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
