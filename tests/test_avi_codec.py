"""MJPEG-AVI container laws: the RIFF walk (direct movi chunks, 'rec '
record nesting, word alignment, ##db ids, other-stream chunks), header
parsing (strh dwRate/dwScale with avih fallback), codec rejection for
inter-coded streams, malformed-input errors, frame-payload fidelity
(container adds zero loss over the bare JPEG bytes), and the Spark lane
(synth -> binary column -> per-frame rows) end-to-end.
"""

import struct

import numpy as np
import pytest

from whitebox_tools_spark.operators.avi_codec import (
    _chunk,
    _list,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from whitebox_tools_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

RNG = np.random.RandomState(20260820)


def _flat_dc(v, q=3):
    """The media_decode_jpeg closed form for a flat grayscale block at
    quality 90 (qDC = 3): only DC survives quantization."""
    kq = np.round(8.0 * (v - 128.0) / q)
    return float(np.clip(np.round(q * kq / 8.0 + 128.0), 0, 255))


def _flat_avi(vals, w, h, fps=10, quality=90):
    frames = [
        encode_jpeg(np.full((h, w), v, np.uint8), quality=quality)
        for v in vals
    ]
    return encode_avi_mjpeg(frames, w, h, fps=fps)


# ------------------------------------------------------------ roundtrips


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (8, 8), (13, 17)])
def test_flat_roundtrip(shape):
    h, w = shape
    vals = [0, 7, 128, 200, 255]
    frames, fps = decode_avi_mjpeg(_flat_avi(vals, w, h, fps=25))
    assert fps == 25.0
    assert len(frames) == len(vals)
    for v, img in zip(vals, frames):
        assert img.shape == (h, w, 1)
        assert np.all(img == _flat_dc(v))


def test_container_is_lossless_over_frame_bytes():
    # the container walk must hand the JPEG decoder the exact bytes it
    # was given — decode(avi)[i] == decode_jpeg(frame_bytes[i])
    imgs = [RNG.randint(0, 256, (16, 24)).astype(np.uint8) for _ in range(3)]
    raw = [encode_jpeg(im, quality=75) for im in imgs]
    frames, _ = decode_avi_mjpeg(encode_avi_mjpeg(raw, 24, 16, fps=12))
    assert len(frames) == 3
    for j, img in zip(raw, frames):
        assert np.array_equal(img, decode_jpeg(j))


def test_odd_length_frame_padding():
    # force odd-sized payloads so the word-alignment pad is exercised
    raw = []
    v = 9
    while len(raw) < 2:
        j = encode_jpeg(np.full((5, 7), v, np.uint8), quality=90)
        if len(j) & 1:
            raw.append(j)
        v += 1
    data = encode_avi_mjpeg(raw, 7, 5, fps=10)
    frames, _ = decode_avi_mjpeg(data)
    assert len(frames) == 2
    for j, img in zip(raw, frames):
        assert np.array_equal(img, decode_jpeg(j))


def test_single_frame_min():
    frames, fps = decode_avi_mjpeg(_flat_avi([42], 1, 1, fps=1))
    assert len(frames) == 1 and fps == 1.0
    assert frames[0].shape == (1, 1, 1)


# --------------------------------------------------------- reader tolerance


def _reassemble(hdrl_extra=b"", movi_payload=b"", frames=None, fps=10,
                w=3, h=2, scale=1, handler=b"MJPG", usec=0):
    """Hand-build an AVI from parts to probe reader tolerance."""
    avih = struct.pack("<IIIIIIIIII4I", usec, 0, 0, 0x10,
                       len(frames or []), 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", handler,
                       0, 0, 0, 0, scale, fps, 0, len(frames or []),
                       0, 0xFFFFFFFF, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)) + hdrl_extra)
    if frames is not None:
        movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    body = hdrl + _list(b"movi", movi_payload)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def test_rec_list_nesting():
    # interleaved AVIs wrap frame chunks in LIST 'rec ' records
    raw = [encode_jpeg(np.full((2, 3), v, np.uint8), quality=90)
           for v in (10, 20, 30)]
    movi = (_list(b"rec ", _chunk(b"00dc", raw[0]) + _chunk(b"00dc", raw[1]))
            + _chunk(b"00dc", raw[2]))
    frames, fps = decode_avi_mjpeg(_reassemble(movi_payload=movi, fps=15))
    assert fps == 15.0
    assert len(frames) == 3
    for j, img in zip(raw, frames):
        assert np.array_equal(img, decode_jpeg(j))


def test_db_chunk_id_and_other_streams_ignored():
    raw = [encode_jpeg(np.full((2, 3), v, np.uint8), quality=90)
           for v in (50, 60)]
    movi = (_chunk(b"00db", raw[0])          # uncompressed-flavoured id
            + _chunk(b"01dc", b"\x00" * 8)   # second stream: skipped
            + _chunk(b"00dc", raw[1]))
    frames, _ = decode_avi_mjpeg(_reassemble(movi_payload=movi))
    assert len(frames) == 2
    for j, img in zip(raw, frames):
        assert np.array_equal(img, decode_jpeg(j))


def test_fps_fallback_to_avih():
    raw = [encode_jpeg(np.full((2, 3), 77, np.uint8), quality=90)]
    # strh dwScale = 0 -> unusable; avih microseconds-per-frame wins
    data = _reassemble(frames=raw, fps=0, scale=0, usec=40_000)
    frames, fps = decode_avi_mjpeg(data)
    assert len(frames) == 1
    assert fps == pytest.approx(25.0)


def test_idx1_is_ignored():
    # a garbage idx1 must not affect decode — movi order is authoritative
    raw = [encode_jpeg(np.full((2, 3), 90, np.uint8), quality=90)]
    data = _reassemble(frames=raw, fps=5)
    data = data[:4] + struct.pack("<I", len(data) - 8 + 8 + 16) + data[8:] \
        + _chunk(b"idx1", b"\xff" * 16)
    frames, fps = decode_avi_mjpeg(data)
    assert len(frames) == 1 and fps == 5.0


# ----------------------------------------------------------------- errors


def test_non_mjpeg_codec_raises():
    raw = [encode_jpeg(np.full((2, 3), 1, np.uint8), quality=90)]
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_mjpeg(_reassemble(frames=raw, handler=b"H264"))


def test_not_avi_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_truncated_movi_chunk_raises():
    data = _flat_avi([100], 3, 2)
    # the file tail is the 24-byte idx1 chunk; trim past it into the
    # movi frame payload so the declared 00dc size overruns the data
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_mjpeg(data[:-30])


def test_no_frames_raises():
    with pytest.raises(ValueError, match="no video frame"):
        decode_avi_mjpeg(_reassemble(frames=[]))


def test_encoder_arg_validation():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([], 3, 2)
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg([b"x"], 3, 2, fps=0)


# ------------------------------------------------------------- Spark lane


def test_avi_lane_end_to_end(spark):
    from whitebox_tools_spark.operators import media

    docs = spark.range(0, 40).selectExpr("id AS doc_id")
    m = media.synth_avi_media(docs)
    out = media.decode_video_frames(m).orderBy("doc_id", "frame_idx").collect()
    by_doc = {}
    for row in out:
        by_doc.setdefault(row.doc_id, []).append(row)
    assert set(by_doc) == set(range(40))
    for did, rows in by_doc.items():
        assert len(rows) == 1 + did % 3
        w, h = 3 + did % 6, 2 + did % 5
        for fi, row in enumerate(rows):
            assert row.frame_idx == fi
            assert (row.width, row.height) == (w, h)
            assert row.fps == pytest.approx(5 + did % 10)
            want = _flat_dc((did * 37 + fi * 53 + 11) % 256)
            assert row.mean_r == pytest.approx(want)
            assert row.mean_g == pytest.approx(want)
            assert row.mean_b == pytest.approx(want)


def test_non_mjpeg_meta_raises_in_lane(spark):
    from pyspark.sql import functions as F

    from whitebox_tools_spark.operators import media

    docs = spark.range(0, 2).selectExpr("id AS doc_id")
    m = media.synth_avi_media(docs).withColumn(
        "meta",
        F.named_struct(
            F.lit("kind"), F.lit("video"),
            F.lit("n_bytes"), F.lit(0),
            F.lit("codec"), F.lit("h264"),
        ),
    )
    with pytest.raises(Exception, match="h264"):
        media.decode_video_frames(m).collect()


def test_sample_video_frames_stride(spark):
    from whitebox_tools_spark.operators import media

    docs = spark.range(0, 30).selectExpr("id AS doc_id")
    m = media.synth_avi_media(docs)
    full = media.decode_video_frames(m).collect()
    want = sorted((r.doc_id, r.frame_idx) for r in full if r.frame_idx % 2 == 0)
    got = media.sample_video_frames(m, stride=2).collect()
    assert sorted((r.doc_id, r.frame_idx) for r in got) == want
    # stride 1 == full decode; frame 0 always present per doc
    all1 = media.sample_video_frames(m, stride=1).collect()
    assert len(all1) == len(full)
    s3 = media.sample_video_frames(m, stride=3).collect()
    assert {r.doc_id for r in s3} == set(range(30))
    assert all(r.frame_idx % 3 == 0 for r in s3)
    import pytest as _pt
    with _pt.raises(ValueError, match="stride"):
        media.sample_video_frames(m, stride=0)


def test_audio_first_avi_video_on_stream_01():
    # a legal AVI may list the audio strl first: audio = stream 00,
    # video = stream 01, frame chunks '01dc'. The walk must follow the
    # vids strh ordinal, not a hardcoded '00'.
    raw = [encode_jpeg(np.full((2, 3), v, np.uint8), quality=90)
           for v in (11, 22)]
    w, h, fps = 3, 2, 10
    avih = struct.pack("<IIIIIIIIII4I", 0, 0, 0, 0x10,
                       len(raw), 0, 2, 0, w, h, 0, 0, 0, 0)
    strh_a = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00" * 4,
                         0, 0, 0, 0, 1, 8000, 0, 0, 0, 0xFFFFFFFF,
                         0, 0, 0, 0, 0)
    strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    strh_v = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG",
                         0, 0, 0, 0, 1, fps, 0, len(raw), 0,
                         0xFFFFFFFF, 0, 0, 0, w, h)
    strf_v = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                         w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a))
        + _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v)),
    )
    movi = _list(b"movi",
                 _chunk(b"00wb", b"\x80" * 16)       # audio payload
                 + _chunk(b"01dc", raw[0])
                 + _chunk(b"00wb", b"\x80" * 16)
                 + _chunk(b"01dc", raw[1]))
    body = hdrl + movi
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    frames, got_fps = decode_avi_mjpeg(data)
    assert got_fps == float(fps)
    assert len(frames) == 2
    for j, img in zip(raw, frames):
        assert np.array_equal(img, decode_jpeg(j))
