"""GIF codec laws: lossless roundtrips (GIF is indexed, so exact),
LZW edge cases, 89a compositing semantics (transparency, disposal,
partial placement), malformed-input errors, a hypothesis property law,
cross-decoder interop against javax.imageio, and the Spark lane
(synth -> binary column -> per-frame features) end-to-end.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from whitebox_tools_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)

RNG = np.random.RandomState(20260820)


def _pal(n=256):
    i = np.arange(n, dtype=np.int64)
    return np.stack(
        [(i * 5 + 3) % 256, (i * 11 + 7) % 256, (i * 17 + 29) % 256], axis=1
    ).astype(np.uint8)


# ------------------------------------------------------------------ LZW


@pytest.mark.parametrize("mcs", [2, 3, 5, 8])
def test_lzw_roundtrip_random(mcs):
    idx = RNG.randint(0, 1 << mcs, 7777).astype(np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, mcs), mcs, idx.size), idx)


def test_lzw_roundtrip_forces_table_reset():
    # highly repetitive data grows the table to 4096 -> CLEAR mid-stream
    idx = np.tile(np.arange(4, dtype=np.uint8), 40000)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 2), 2, idx.size), idx)


def test_lzw_kwkwk_case():
    # 'aaaa...' triggers the code == next_code self-reference immediately
    idx = np.zeros(64, np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 2), 2, idx.size), idx)


def test_lzw_truncated_raises():
    idx = RNG.randint(0, 16, 500).astype(np.uint8)
    enc = _lzw_encode(idx, 4)
    with pytest.raises(ValueError, match="truncated|ended"):
        _lzw_decode(enc[: len(enc) // 4], 4, idx.size)


# ------------------------------------------------------------ roundtrips


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (8, 8), (13, 17), (9, 31)])
def test_single_frame_roundtrip(shape, interlace):
    pal = _pal()
    f = RNG.randint(0, 256, shape).astype(np.uint8)
    frames, delays = decode_gif(encode_gif(f, pal, interlace=interlace))
    assert len(frames) == 1
    assert np.array_equal(frames[0], pal[f.astype(np.int64)])


def test_animated_roundtrip_with_delays():
    pal = _pal()
    fr = [RNG.randint(0, 256, (6, 7)).astype(np.uint8) for _ in range(4)]
    frames, delays = decode_gif(encode_gif(fr, pal, delays_cs=[1, 2, 3, 4]))
    assert delays == [1, 2, 3, 4]
    for f, got in zip(fr, frames):
        assert np.array_equal(got, pal[f.astype(np.int64)])


def test_small_palette_roundtrip():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    f = (RNG.randint(0, 2, (11, 5))).astype(np.uint8)
    frames, _ = decode_gif(encode_gif(f, pal))
    assert np.array_equal(frames[0], pal[f.astype(np.int64)])


def test_header_is_gif89a_with_netscape_loop_for_animations():
    pal = _pal(4)
    data = encode_gif([np.zeros((2, 2), np.uint8)] * 2, pal, loop=5)
    assert data[:6] == b"GIF89a"
    assert b"NETSCAPE2.0" in data
    single = encode_gif(np.zeros((2, 2), np.uint8), pal)
    assert b"NETSCAPE2.0" not in single


# --------------------------------------------------- compositing semantics


def _raw_frame_block(idx, left, top, pal_bits=None, transparent=None,
                     disposal=0, delay=0):
    """Hand-build GCE + image descriptor + LZW data for one partial
    frame (encoder only writes full-screen frames; the decoder must
    handle external files' partial placements)."""
    h, w = idx.shape
    flags = (disposal << 2) | (1 if transparent is not None else 0)
    out = b"\x21\xF9" + struct.pack(
        "<BBHBB", 4, flags, delay, transparent or 0, 0
    )
    out += b"\x2C" + struct.pack("<HHHHB", left, top, w, h, 0)
    mcs = 8
    out += bytes([mcs])
    payload = _lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return out


def _screen(w, h, pal, bg=0):
    ct_bits = max(1, (len(pal) - 1).bit_length())
    gct = np.zeros((1 << ct_bits, 3), np.uint8)
    gct[: len(pal)] = pal
    head = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | 0x70 | (ct_bits - 1), bg, 0
    )
    return head + gct.tobytes()


def test_partial_placement_composites_over_previous():
    pal = _pal()
    base = np.full((4, 6), 9, np.uint8)
    patch = np.full((2, 2), 77, np.uint8)
    data = (_screen(6, 4, pal)
            + _raw_frame_block(base, 0, 0)
            + _raw_frame_block(patch, 3, 1)
            + b"\x3B")
    frames, _ = decode_gif(data)
    assert len(frames) == 2
    expect = pal[base.astype(np.int64)].copy()
    expect[1:3, 3:5] = pal[77]
    assert np.array_equal(frames[1], expect)


def test_transparent_index_keeps_underlying_pixels():
    pal = _pal()
    base = np.full((3, 3), 5, np.uint8)
    over = np.array([[1, 200, 1], [200, 1, 200], [1, 1, 1]], np.uint8)
    data = (_screen(3, 3, pal)
            + _raw_frame_block(base, 0, 0)
            + _raw_frame_block(over, 0, 0, transparent=1)
            + b"\x3B")
    frames, _ = decode_gif(data)
    expect = pal[np.where(over == 1, base, over).astype(np.int64)]
    assert np.array_equal(frames[1], expect)


def test_disposal_restore_to_background():
    pal = _pal()
    base = np.full((2, 4), 30, np.uint8)
    data = (_screen(4, 2, pal, bg=7)
            + _raw_frame_block(base, 0, 0, disposal=2)
            + _raw_frame_block(np.full((1, 1), 60, np.uint8), 0, 0)
            + b"\x3B")
    frames, _ = decode_gif(data)
    # after disposal=2 the whole drawn region resets to the background
    # colour before frame 2's 1x1 patch lands
    expect = np.tile(pal[7], (2, 4, 1))
    expect[0, 0] = pal[60]
    assert np.array_equal(frames[1], expect)


def test_disposal_restore_to_previous():
    pal = _pal()
    base = np.full((2, 2), 11, np.uint8)
    flash = np.full((2, 2), 99, np.uint8)
    tail = np.full((1, 1), 50, np.uint8)
    data = (_screen(2, 2, pal)
            + _raw_frame_block(base, 0, 0)
            + _raw_frame_block(flash, 0, 0, disposal=3)
            + _raw_frame_block(tail, 1, 1)
            + b"\x3B")
    frames, _ = decode_gif(data)
    assert np.array_equal(frames[1], pal[flash.astype(np.int64)])
    expect = pal[base.astype(np.int64)].copy()
    expect[1, 1] = pal[50]
    assert np.array_equal(frames[2], expect)


def test_gif87a_accepted():
    pal = _pal(4)
    data = encode_gif(np.zeros((2, 2), np.uint8), pal)
    data = b"GIF87a" + data[6:]
    frames, _ = decode_gif(data)
    assert frames[0].shape == (2, 2, 3)


# ------------------------------------------------------------- malformed


def test_not_a_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG... definitely not")


def test_image_block_exceeding_screen_raises():
    pal = _pal()
    data = (_screen(3, 3, pal)
            + _raw_frame_block(np.zeros((4, 4), np.uint8), 1, 1)
            + b"\x3B")
    with pytest.raises(ValueError, match="exceeds"):
        decode_gif(data)


def test_palette_index_out_of_range_raises():
    # 2-entry palette (1-bit table) but the LZW data can still name
    # index 1 only; hand-craft a 4-colour table with a 6-index reference
    pal = _pal(4)
    bad = np.full((2, 2), 6, np.uint8)
    data = _screen(2, 2, pal) + _raw_frame_block(bad, 0, 0) + b"\x3B"
    with pytest.raises(ValueError, match="code|index"):
        decode_gif(data)


def test_no_image_blocks_raises():
    pal = _pal(4)
    with pytest.raises(ValueError, match="no image blocks"):
        decode_gif(_screen(2, 2, pal) + b"\x3B")


def test_truncated_subblock_chain_raises():
    pal = _pal()
    data = _screen(4, 4, pal) + _raw_frame_block(
        np.zeros((4, 4), np.uint8), 0, 0
    )
    with pytest.raises(ValueError):
        decode_gif(data[:-8])


def test_frame_beyond_palette_raises_on_encode():
    with pytest.raises(ValueError, match="beyond the palette"):
        encode_gif(np.full((2, 2), 3, np.uint8), _pal(3))


# ------------------------------------------------------------- property


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    n_frames=st.integers(1, 3),
    n_colors=st.integers(2, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_law(h, w, n_frames, n_colors, interlace, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    fr = [rng.randint(0, n_colors, (h, w)).astype(np.uint8)
          for _ in range(n_frames)]
    frames, delays = decode_gif(encode_gif(fr, pal, interlace=interlace))
    assert len(frames) == n_frames
    for f, got in zip(fr, frames):
        assert np.array_equal(got, pal[f.astype(np.int64)])


# ---------------------------------------------------------------- interop


@pytest.fixture(scope="module")
def jvm(spark):
    return spark.sparkContext._jvm


def test_gif_ours_to_imageio_exact(jvm):
    """javax.imageio must read our bytes to the same RGB pixels."""
    pal = _pal()
    f = RNG.randint(0, 256, (14, 9)).astype(np.uint8)
    data = encode_gif(f, pal)
    bis = jvm.java.io.ByteArrayInputStream(bytearray(data))
    bi = jvm.javax.imageio.ImageIO.read(bis)
    assert bi is not None, "javax.imageio could not parse our GIF"
    w, h = bi.getWidth(), bi.getHeight()
    argb = bi.getRGB(0, 0, w, h, None, 0, w)
    a = np.array(argb, dtype=np.int64).reshape(h, w)
    got = np.stack(
        [(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF], axis=2
    ).astype(np.uint8)
    assert np.array_equal(got, pal[f.astype(np.int64)])


def test_gif_imageio_to_ours_exact(jvm):
    """Our decoder must read an externally produced GIF. Use an indexed
    BufferedImage so Java's writer needs no colour quantization."""
    pal = _pal(64)
    f = RNG.randint(0, 64, (10, 13)).astype(np.uint8)
    h, w = f.shape
    # pass the palette as Python bytearrays (py4j maps them to byte[]
    # directly; a reflect-built byte[] mutated via Array.setByte does
    # NOT round-trip through py4j — it arrives all zeros)
    icm = jvm.java.awt.image.IndexColorModel(
        6, 64,
        bytearray(pal[:, 0].tobytes()),
        bytearray(pal[:, 1].tobytes()),
        bytearray(pal[:, 2].tobytes()),
    )
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm
    )
    raster = bi.getRaster()
    for r in range(h):
        for c in range(w):
            raster.setSample(c, r, 0, int(f[r, c]))
    bos = jvm.java.io.ByteArrayOutputStream()
    ok = jvm.javax.imageio.ImageIO.write(bi, "gif", bos)
    assert ok, "javax.imageio has no gif writer"
    frames, _ = decode_gif(bytes(bos.toByteArray()))
    assert np.array_equal(frames[0], pal[f.astype(np.int64)])


# ------------------------------------------------------------- Spark lane


def test_gif_lane_end_to_end(spark):
    from whitebox_tools_spark.operators import media

    docs = spark.range(0, 40).selectExpr("id AS doc_id")
    m = media.synth_gif_media(docs)
    out = media.decode_gif_frames(m).orderBy("doc_id", "frame_idx").collect()
    # frame counts follow 1 + id%3
    by_doc = {}
    for row in out:
        by_doc.setdefault(row.doc_id, []).append(row)
    for did, rows in by_doc.items():
        assert len(rows) == 1 + did % 3
        w, h = 2 + did % 5, 2 + did % 4
        for fi, row in enumerate(rows):
            assert (row.width, row.height) == (w, h)
            assert row.frame_idx == fi
            assert row.delay_cs == did % 10
            # closed-form mean check for channel r
            idx = (did * 13 + fi * 7
                   + np.arange(h)[:, None] * 19
                   + np.arange(w)[None, :] * 31) % 256
            assert row.mean_r == pytest.approx(((idx * 5 + 3) % 256).mean())
