"""Multimodal (binary) columns: schema, synthesis, decode plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct,
exactly how a 100 TB multimodal corpus stores them next to text spans.
The decode / feature-extract step is a Pandas-UDF ``mapInPandas`` whose
Spark-side plumbing (schema, Arrow batching, partition mapping) is real
and tested. The 'real' decode lane has five dependency-free codecs — a
pure-numpy 24-bit BMP parser (:func:`decode_bmp`), a full PNG codec
(operators/png_codec.py: stdlib zlib + the five spec filters in numpy;
grey/RGB/indexed/alpha, depths 1-16), a baseline JPEG codec
(operators/jpeg_codec.py: T.81 Huffman + DCT, 4:4:4/4:2:0, restart
markers), an animated GIF codec (operators/gif_codec.py: GIF-variant
LZW, interlace, transparency + disposal compositing — the real
frame-extraction path) and a RIFF/WAVE PCM-16 parser
(:func:`decode_wav`) — so the end-to-end image, animation AND audio
paths (encode -> binary column -> Arrow batch -> decode -> features)
are genuinely exercised on real formats; only true video containers
(ffmpeg) still raise NotImplementedError at the documented integration
point.
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


def synth_png_media(docs: DataFrame, record: str = "doc_id") -> DataFrame:
    """Deterministic PNG media table: per doc, a (2 + id%4) x (2 + id%6)
    RGB image with pixel[r,c,ch] = (id*11 + r*17 + c*23 + ch*41) % 256 —
    closed-form, so a SQL oracle can recompute every channel mean — and
    scanline filter type id % 5, so the corpus exercises ALL five PNG
    filters (None/Sub/Up/Average/Paeth). PNG bytes are built
    executor-side in Arrow batches (stdlib zlib + numpy)."""
    from whitebox_tools_spark.operators.png_codec import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[record]:
                did = int(did)
                w, h = 2 + did % 6, 2 + did % 4
                r_idx = np.arange(h, dtype=np.int64)[:, None, None]
                c_idx = np.arange(w, dtype=np.int64)[None, :, None]
                ch_idx = np.arange(3, dtype=np.int64)[None, None, :]
                img = ((did * 11 + r_idx * 17 + c_idx * 23 + ch_idx * 41) % 256
                       ).astype(np.uint8)
                payload = encode_png(img, filter_type=did % 5)
                rows.append((
                    did,
                    f"png://{did}",
                    payload,
                    {"kind": "image", "n_bytes": len(payload), "codec": "png"},
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


def synth_jpeg_media(docs: DataFrame, record: str = "doc_id") -> DataFrame:
    """Deterministic JPEG media table: per doc, a flat grayscale
    (3 + id%6) x (2 + id%5) image with constant value (id*37 + 11) % 256
    at quality 90. A flat 8x8 block has only a DC coefficient and every
    AC quantizes to zero, so the decoded constant is the closed form
    clamp(round(3*round(8*(v-128)/3)/8 + 128)) — EXACTLY reproducible in
    SQL (verified tie-free for all 256 values), which makes the lossy
    codec oracle-checkable with a value hash, not a tolerance. The full
    AC path is covered by tests/test_jpeg_codec.py."""
    from whitebox_tools_spark.operators.jpeg_codec import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[record]:
                did = int(did)
                w, h = 3 + did % 6, 2 + did % 5
                v = (did * 37 + 11) % 256
                img = np.full((h, w), v, dtype=np.uint8)
                payload = encode_jpeg(img, quality=90)
                rows.append((
                    did,
                    f"jpeg://{did}",
                    payload,
                    {"kind": "image", "n_bytes": len(payload), "codec": "jpeg"},
                ))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "media_ref", "payload", "meta"]
                )

    return docs.select(record).mapInPandas(run, schema=MEDIA_SCHEMA)


def _to_rgb8(img: np.ndarray) -> np.ndarray:
    """Any decoded image (grey / grey+alpha / RGB / RGBA, uint8 or
    uint16) -> (h, w, 3) uint8 for the feature extractor: alpha dropped,
    grey replicated, 16-bit scaled by the high byte."""
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    ch = img.shape[2]
    if ch == 2 or ch == 4:  # drop alpha
        img = img[:, :, :-1]
        ch -= 1
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def _decode_by_codec(payload: bytes, codec: str) -> np.ndarray:
    """Dispatch real still-image decode by meta.codec -> (h, w, 3)
    uint8 RGB. The shared entry for every image-feature lane."""
    from whitebox_tools_spark.operators.jpeg_codec import decode_jpeg
    from whitebox_tools_spark.operators.png_codec import decode_png

    if codec == "bmp":
        return decode_bmp(payload)
    if codec == "png":
        return _to_rgb8(decode_png(payload))
    if codec == "jpeg":
        return _to_rgb8(decode_jpeg(payload))
    raise NotImplementedError(
        f"real image decode for codec {codec!r} requires native "
        "libraries; plug them in here"
    )


def decode_image_features(media: DataFrame) -> DataFrame:
    """The REAL decode lane: parse each payload by meta.codec and emit
    per-channel image features. codec='bmp' decodes with the pure-numpy
    BMP parser, codec='png' with the stdlib-zlib+numpy PNG codec
    (operators/png_codec.py), codec='jpeg' with the baseline T.81 codec
    (operators/jpeg_codec.py); any other codec raises
    NotImplementedError at this exact point — swap in ffmpeg here for
    video, the Spark plumbing is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                img = _decode_by_codec(bytes(payload), meta["codec"])
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


# --------------------------------------------------------------- GIF lane
# The animated-frame format: GIF makes the video-shaped frame-extraction
# path REAL (decode container -> per-frame composited images -> per-frame
# features), where true video containers still need ffmpeg.


_FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("delay_cs", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def synth_gif_media(docs: DataFrame, record: str = "doc_id") -> DataFrame:
    """Deterministic animated-GIF media table: per doc, (1 + id%3)
    frames of a (2 + id%4) x (2 + id%5) index grid where frame f pixel
    (r, c) has palette index (id*13 + f*7 + r*19 + c*31) % 256 over the
    closed-form palette pal[i] = ((i*5+3)%256, (i*11+7)%256,
    (i*17+29)%256) — so a SQL oracle can recompute every per-frame
    channel mean through the palette indirection. Odd ids are written
    interlaced, so the corpus exercises both scan orders; per-frame
    delay is id % 10 centiseconds. GIF bytes are built executor-side in
    Arrow batches (operators/gif_codec.py)."""
    from whitebox_tools_spark.operators.gif_codec import encode_gif

    pal_i = np.arange(256, dtype=np.int64)
    palette = np.stack(
        [(pal_i * 5 + 3) % 256, (pal_i * 11 + 7) % 256, (pal_i * 17 + 29) % 256],
        axis=1,
    ).astype(np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[record]:
                did = int(did)
                w, h = 2 + did % 5, 2 + did % 4
                n_frames = 1 + did % 3
                r_idx = np.arange(h, dtype=np.int64)[:, None]
                c_idx = np.arange(w, dtype=np.int64)[None, :]
                frames = [
                    ((did * 13 + f * 7 + r_idx * 19 + c_idx * 31) % 256
                     ).astype(np.uint8)
                    for f in range(n_frames)
                ]
                payload = encode_gif(
                    frames, palette, delays_cs=did % 10,
                    interlace=bool(did % 2),
                )
                rows.append((
                    did,
                    f"gif://{did}",
                    payload,
                    {"kind": "video", "n_bytes": len(payload), "codec": "gif"},
                ))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "media_ref", "payload", "meta"]
                )

    return docs.select(record).mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_gif_frames(media: DataFrame) -> DataFrame:
    """REAL frame extraction: decode each GIF payload (container walk,
    LZW, palette, interlace, disposal compositing — gif_codec.py) and
    emit one row per composited frame with per-channel means. This is
    the distributed shape of video frame sampling with an actually-real
    dependency-free format; containers needing ffmpeg still raise in
    :func:`decode_features`."""
    from whitebox_tools_spark.operators.gif_codec import decode_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["codec"] != "gif":
                    raise NotImplementedError(
                        f"frame decode for codec {meta['codec']!r} requires "
                        "native libraries (ffmpeg); plug them in here"
                    )
                frames, delays = decode_gif(bytes(payload))
                for fi, (img, d) in enumerate(zip(frames, delays)):
                    out.append((
                        int(doc_id), fi, img.shape[1], img.shape[0], int(d),
                        float(img[:, :, 0].mean()),
                        float(img[:, :, 1].mean()),
                        float(img[:, :, 2].mean()),
                    ))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["doc_id", "frame_idx", "width", "height",
                             "delay_cs", "mean_r", "mean_g", "mean_b"],
                )

    return media.select("doc_id", "payload", "meta").mapInPandas(
        run, schema=_FRAME_FEATURE_SCHEMA
    )


# ---------------------------------------------------------- MJPEG-AVI lane
# A REAL video container: RIFF AVI with one JPEG per frame, decoded by
# the in-repo T.81 codec — so the video path (container walk -> frame
# bytes -> image decode -> per-frame features) runs end-to-end without
# ffmpeg. Inter-coded codecs (H.264 etc.) still raise at decode.


_VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def synth_avi_media(docs: DataFrame, record: str = "doc_id") -> DataFrame:
    """Deterministic MJPEG-AVI media table: per doc, (1 + id%3) flat
    grayscale JPEG frames of (3 + id%6) x (2 + id%5) at quality 90 with
    frame f constant (id*37 + f*53 + 11) % 256, at fps 5 + id%10. Flat
    frames keep the lossy codec EXACTLY oracle-checkable per frame (the
    media_decode_jpeg closed form), so the whole container + entropy +
    DCT chain pins with a value hash. AVI bytes are built executor-side
    (operators/avi_codec.py)."""
    from whitebox_tools_spark.operators.avi_codec import encode_avi_mjpeg
    from whitebox_tools_spark.operators.jpeg_codec import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[record]:
                did = int(did)
                w, h = 3 + did % 6, 2 + did % 5
                frames = [
                    encode_jpeg(
                        np.full((h, w), (did * 37 + f * 53 + 11) % 256,
                                np.uint8),
                        quality=90,
                    )
                    for f in range(1 + did % 3)
                ]
                payload = encode_avi_mjpeg(frames, w, h, fps=5 + did % 10)
                rows.append((
                    did,
                    f"avi://{did}",
                    payload,
                    {"kind": "video", "n_bytes": len(payload), "codec": "mjpeg-avi"},
                ))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "media_ref", "payload", "meta"]
                )

    return docs.select(record).mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_video_frames(media: DataFrame) -> DataFrame:
    """REAL video frame extraction: walk each AVI container, decode
    every MJPEG frame with the in-repo JPEG codec, emit one row per
    frame with per-channel means. Codecs beyond MJPEG raise at this
    documented point — plug ffmpeg in here, the Spark plumbing (binary
    column -> Arrow batch -> frame rows) is identical."""
    from whitebox_tools_spark.operators.avi_codec import decode_avi_mjpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["codec"] != "mjpeg-avi":
                    raise NotImplementedError(
                        f"video decode for codec {meta['codec']!r} requires "
                        "native libraries (ffmpeg); plug them in here"
                    )
                frames, fps = decode_avi_mjpeg(bytes(payload))
                for fi, img in enumerate(frames):
                    img3 = _to_rgb8(img)
                    out.append((
                        int(doc_id), fi, img3.shape[1], img3.shape[0],
                        float(fps),
                        float(img3[:, :, 0].mean()),
                        float(img3[:, :, 1].mean()),
                        float(img3[:, :, 2].mean()),
                    ))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["doc_id", "frame_idx", "width", "height",
                             "fps", "mean_r", "mean_g", "mean_b"],
                )

    return media.select("doc_id", "payload", "meta").mapInPandas(
        run, schema=_VIDEO_FEATURE_SCHEMA
    )


def sample_video_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Temporal sampling over REAL video containers: decode each AVI,
    keep every ``stride``-th frame (frame 0 always kept — the keyframe
    convention of fixed-stride samplers), emit the same per-frame rows
    as :func:`decode_video_frames`. The per-clip decode stays
    partition-parallel; a 100-TB corpus samples at full width."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    from whitebox_tools_spark.operators.avi_codec import decode_avi_mjpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["codec"] != "mjpeg-avi":
                    raise NotImplementedError(
                        f"video decode for codec {meta['codec']!r} requires "
                        "native libraries (ffmpeg); plug them in here"
                    )
                frames, fps = decode_avi_mjpeg(bytes(payload))
                for fi in range(0, len(frames), stride):
                    img3 = _to_rgb8(frames[fi])
                    out.append((
                        int(doc_id), fi, img3.shape[1], img3.shape[0],
                        float(fps),
                        float(img3[:, :, 0].mean()),
                        float(img3[:, :, 1].mean()),
                        float(img3[:, :, 2].mean()),
                    ))
            if out:
                yield pd.DataFrame(
                    out, columns=[f.name for f in _VIDEO_FEATURE_SCHEMA.fields])

    return media.select("doc_id", "payload", "meta").mapInPandas(
        run, schema=_VIDEO_FEATURE_SCHEMA
    )


# --------------------------------------------------------------- WAV codec
# Pure-struct/numpy RIFF/WAVE PCM-16 — the audio twin of the BMP lane, so
# the 'real' decode path covers both image and audio without native libs.


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, ch) int16 PCM -> WAV bytes (RIFF, fmt 1, 16-bit)."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("encode_wav expects (n,) or (n, ch) int16")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    body = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    return out


def _g711_luts() -> tuple[np.ndarray, np.ndarray]:
    """256-entry µ-law / A-law -> int16 expansion tables (ITU-T G.711;
    the classic Sun/CCITT reference expressions, vectorized once)."""
    c = np.arange(256, dtype=np.int32)
    # µ-law: complement, then mag = (((mant<<3) + 0x84) << exp) - 0x84
    u = ~c & 0xFF
    t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7)
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)
    # A-law: xor 0x55, segment 0/1 linear, higher segments shifted
    a = c ^ 0x55
    seg = (a >> 4) & 7
    base = (a & 0xF) << 4
    mag = np.where(
        seg == 0, base + 8,
        np.where(seg == 1, base + 0x108, (base + 0x108) << np.maximum(seg - 1, 0)),
    )
    alaw = np.where(a & 0x80, mag, -mag).astype(np.int16)
    return ulaw, alaw


_ULAW_LUT, _ALAW_LUT = _g711_luts()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, (n, ch) int16). Walks the RIFF chunk
    list (extra chunks — LIST, fact, cue — are skipped) and handles the
    sample formats real corpora actually contain:

    - PCM  8-bit (unsigned, rescaled to int16), 16-bit (native),
      24-bit (packed 3-byte, high 16 bits kept) and 32-bit (high 16
      bits kept);
    - IEEE float 32/64 (fmt 3; [-1, 1] clipped and scaled to int16);
    - ITU-T G.711 A-law (fmt 6) and µ-law (fmt 7) telephony companding,
      expanded through 256-entry LUTs;
    - WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE) resolving to any of the
      above via the SubFormat GUID's leading format code.

    Everything lands in one int16 representation so downstream feature
    extraction is format-agnostic."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, rate, ch, bits, afmt, body = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"fmt ":
            afmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, pos + 8
            )
            if afmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: code in GUID
                if size < 40:
                    raise ValueError("WAV: truncated extensible fmt chunk")
                (afmt,) = struct.unpack_from("<H", data, pos + 8 + 24)
        elif cid == b"data":
            body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or body is None:
        raise ValueError("WAV missing fmt/data chunk")
    if not ch:
        raise ValueError("WAV: zero channels")
    if afmt == 1:
        if bits == 16:
            flat = np.frombuffer(body, dtype="<i2").astype(np.int16)
        elif bits == 8:  # 8-bit PCM is unsigned
            u = np.frombuffer(body, dtype=np.uint8).astype(np.int32)
            flat = ((u - 128) << 8).astype(np.int16)
        elif bits == 24:  # packed little-endian 3-byte; keep high 16
            raw = np.frombuffer(body, dtype=np.uint8)
            raw = raw[: raw.size - raw.size % 3].reshape(-1, 3)
            flat = (raw[:, 1].astype(np.int32)
                    | (raw[:, 2].astype(np.int32) << 8)).astype(np.int16)
        elif bits == 32:
            flat = (np.frombuffer(body, dtype="<i4") >> 16).astype(np.int16)
        else:
            raise NotImplementedError(f"PCM WAV with bits={bits}")
    elif afmt == 3:  # IEEE float
        if bits == 32:
            f = np.frombuffer(body, dtype="<f4").astype(np.float64)
        elif bits == 64:
            f = np.frombuffer(body, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"float WAV with bits={bits}")
        flat = np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)
    elif afmt in (6, 7):  # G.711 A-law / µ-law (8-bit companded)
        if bits not in (0, 8):
            raise ValueError(f"G.711 WAV must be 8-bit, got bits={bits}")
        lut = _ALAW_LUT if afmt == 6 else _ULAW_LUT
        flat = lut[np.frombuffer(body, dtype=np.uint8)]
    else:
        raise NotImplementedError(
            f"WAV format {afmt} not supported (PCM, IEEE float and G.711 "
            "only; compressed codecs need native libraries)"
        )
    n = flat.size - flat.size % ch
    samples = flat[:n].reshape(-1, ch)
    return int(rate), samples


def synth_wav_media(docs: DataFrame, record: str = "doc_id") -> DataFrame:
    """Deterministic WAV media table: per doc, (8 + id%16) frames x
    (1 + id%2) channels at rate 8000 + (id%4)*4000, with
    sample[i, c] = ((id*31 + i*17 + c*101) % 65536) - 32768 —
    closed-form, so a SQL oracle recomputes every feature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[record]:
                did = int(did)
                n, ch = 8 + did % 16, 1 + did % 2
                rate = 8000 + (did % 4) * 4000
                i_idx = np.arange(n, dtype=np.int64)[:, None]
                c_idx = np.arange(ch, dtype=np.int64)[None, :]
                s = ((did * 31 + i_idx * 17 + c_idx * 101) % 65536 - 32768
                     ).astype(np.int16)
                payload = encode_wav(s, rate)
                rows.append((
                    did,
                    f"wav://{did}",
                    payload,
                    {"kind": "audio", "n_bytes": len(payload), "codec": "wav"},
                ))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "media_ref", "payload", "meta"]
                )

    return docs.select(record).mapInPandas(run, schema=MEDIA_SCHEMA)


_AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_sample", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """The REAL audio decode lane: parse each payload by meta.codec and
    emit per-clip features (rate, shape, mean sample, peak |amplitude|).
    codec='wav' decodes with the pure-numpy RIFF parser; any other codec
    raises NotImplementedError at this exact point — swap in ffmpeg
    here, the Spark plumbing is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["codec"] != "wav":
                    raise NotImplementedError(
                        f"real audio decode for codec {meta['codec']!r} "
                        "requires native libraries (ffmpeg); plug them in here"
                    )
                rate, s = decode_wav(bytes(payload))
                s64 = s.astype(np.int64)
                out.append((
                    int(doc_id), rate, s.shape[1], s.shape[0],
                    float(s64.sum()) / s64.size,
                    int(np.abs(s64).max()),
                ))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["doc_id", "sample_rate", "channels",
                             "n_samples", "mean_sample", "peak"],
                )

    return media.select("doc_id", "payload", "meta").mapInPandas(
        run, schema=_AUDIO_FEATURE_SCHEMA
    )


_AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rms_energy", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("silence_ratio", T.DoubleType()),
        T.StructField("clip_ratio", T.DoubleType()),
    ]
)


def audio_stats(
    media: DataFrame,
    silence_threshold: int = 1024,
    clip_threshold: int = 32256,
) -> DataFrame:
    """Training-data audio quality stats over decoded WAV clips, all
    integer-exact so a SQL oracle recomputes them bit-identically:

    - ``rms_energy``: sum(v^2)/count as DOUBLE (the exact integer sum
      divides once — no per-sample float accumulation);
    - ``zero_crossings``: channel-0 sign changes, sign(v) := v >= 0;
    - ``silence_ratio``: fraction of samples with \\|v\\| < threshold —
      the mostly-silent-clip filter;
    - ``clip_ratio``: fraction with \\|v\\| >= clip_threshold — the
      clipped/distorted-recording filter.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["codec"] != "wav":
                    raise NotImplementedError(
                        f"real audio decode for codec {meta['codec']!r} "
                        "requires native libraries (ffmpeg); plug them in here"
                    )
                _, s = decode_wav(bytes(payload))
                v = s.astype(np.int64)
                if v.size == 0:
                    # structurally valid but empty data chunk (truncated
                    # upload): emit an all-silent row instead of killing
                    # the whole partition with a ZeroDivisionError
                    out.append((int(doc_id), 0.0, 0, 1.0, 0.0))
                    continue
                c0 = v[:, 0] >= 0
                out.append((
                    int(doc_id),
                    float((v * v).sum()) / v.size,
                    int(np.count_nonzero(c0[1:] != c0[:-1])),
                    float(np.count_nonzero(np.abs(v) < silence_threshold))
                    / v.size,
                    float(np.count_nonzero(np.abs(v) >= clip_threshold))
                    / v.size,
                ))
            if out:
                yield pd.DataFrame(
                    out, columns=[f.name for f in _AUDIO_STATS_SCHEMA.fields])

    return media.select("doc_id", "payload", "meta").mapInPandas(
        run, schema=_AUDIO_STATS_SCHEMA
    )


_IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("brightness", T.DoubleType()),
        T.StructField("contrast", T.DoubleType()),
        T.StructField("edge_energy", T.DoubleType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Training-data image quality stats over real decoded images, all
    built from exact integer sums (one double division at the end) so a
    SQL oracle recomputes them bit-identically:

    - ``brightness``: mean pixel value over all channels;
    - ``contrast``: variance E[v^2] - E[v]^2 (flat/blank-image filter);
    - ``edge_energy``: mean \\|horizontal difference\\| over all
      channels — the cheap blur/empty-content proxy (a separable slice
      of the usual Laplacian sharpness score).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                img = _decode_by_codec(bytes(payload), meta["codec"])
                v = img.astype(np.int64)
                n = v.size
                m = float(v.sum()) / n
                e2 = float((v * v).sum()) / n
                dx = np.abs(v[:, 1:, :] - v[:, :-1, :])
                out.append((
                    int(doc_id), m, e2 - m * m,
                    float(dx.sum()) / dx.size if dx.size else 0.0,
                ))
            if out:
                yield pd.DataFrame(
                    out, columns=[f.name for f in _IMAGE_STATS_SCHEMA.fields])

    return media.select("doc_id", "payload", "meta").mapInPandas(
        run, schema=_IMAGE_STATS_SCHEMA
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
                "images (BMP/PNG/JPEG are supported dependency-free) and "
                "decode_audio_features for WAV; video needs native "
                "libraries (ffmpeg) — plug them in here"
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
