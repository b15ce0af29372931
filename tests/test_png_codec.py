"""PNG codec (operators/png_codec.py): roundtrips across every
filter/colour/depth combination, an INDEPENDENT scalar reference
filter implementation transcribed from the spec pseudocode (§9) as a
cross-check (so a complementary encoder+decoder bug can't hide), and
the malformed-input guards."""

import itertools
import struct
import zlib

import numpy as np
import pytest

from whitebox_tools_spark.operators import png_codec as P

RNG = np.random.RandomState(20260820)


def test_roundtrip_matrix():
    rng = np.random.default_rng(3)
    for (h, w), ch, depth, ft in itertools.product(
        [(1, 1), (2, 3), (7, 11), (16, 16)], [1, 2, 3, 4], [8, 16], range(5)
    ):
        dt = np.uint8 if depth == 8 else np.uint16
        img = rng.integers(0, 2 ** depth, size=(h, w, ch)).astype(dt)
        back = P.decode_png(P.encode_png(img, filter_type=ft))
        assert back.dtype == dt and np.array_equal(back, img), (h, w, ch, depth, ft)


def test_roundtrip_indexed_and_subbyte():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(17, 3)).astype(np.uint8)
    idx = rng.integers(0, 17, size=(6, 9)).astype(np.uint8)
    for ft in range(5):
        back = P.decode_png(P.encode_png(idx, color_type=3, palette=pal,
                                         filter_type=ft))
        assert np.array_equal(back, pal[idx.astype(int)])
    # sub-byte depths arrive from other encoders; build the scanlines by
    # hand (our encoder writes depth 8/16 only)
    for depth in (1, 2, 4):
        w, h = 11, 3
        img = rng.integers(0, 2 ** depth, size=(h, w)).astype(np.uint8)
        stride = (w * depth + 7) // 8
        lines = b""
        for r in range(h):
            bits = np.zeros(stride * 8, np.uint8)
            for c in range(w):
                for b in range(depth):
                    bits[c * depth + b] = (img[r, c] >> (depth - 1 - b)) & 1
            lines += b"\x00" + np.packbits(bits).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
                + P._chunk(b"IDAT", zlib.compress(lines))
                + P._chunk(b"IEND", b""))
        back = P.decode_png(data)
        assert np.array_equal(back[:, :, 0], img), depth


def _ref_filter(ftype, row, prev, bpp):
    """Scalar transcription of the spec §9 filter pseudocode — written
    independently of the codec's vectorized path, byte at a time."""
    out = bytearray(len(row))
    for x in range(len(row)):
        a = row[x - bpp] if x >= bpp else 0            # Raw(x-bpp)
        b = prev[x]                                    # Prior(x)
        c = prev[x - bpp] if x >= bpp else 0           # Prior(x-bpp)
        if ftype == 0:
            out[x] = row[x]
        elif ftype == 1:
            out[x] = (row[x] - a) % 256
        elif ftype == 2:
            out[x] = (row[x] - b) % 256
        elif ftype == 3:
            out[x] = (row[x] - (a + b) // 2) % 256
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (row[x] - pr) % 256
    return bytes(out)


def test_decoder_against_scalar_spec_reference():
    """Feed the decoder scanlines filtered by the independent scalar
    reference (per-row filter cycling 0..4) and require exact pixel
    recovery — this catches any complementary encode/decode bug."""
    rng = np.random.default_rng(9)
    for ch in (1, 2, 3, 4):
        h, w = 9, 13
        img = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
        bpp = ch
        raw = img.reshape(h, -1)
        prev = bytes(raw.shape[1])
        lines = b""
        for r in range(h):
            ft = r % 5
            lines += bytes([ft]) + _ref_filter(ft, bytes(raw[r]), prev, bpp)
            prev = bytes(raw[r])
        ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch],
                           0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
                + P._chunk(b"IDAT", zlib.compress(lines))
                + P._chunk(b"IEND", b""))
        assert np.array_equal(P.decode_png(data), img), ch


def test_sixteen_bit_samples_are_big_endian():
    """Spec §7.1: 16-bit samples are MSB-first in the datastream."""
    img = np.array([[[0x1234]]], dtype=np.uint16)
    data = P.encode_png(img, filter_type=0)
    # one scanline: filter byte 0 then the two sample bytes
    raw = zlib.decompress(data[data.index(b"IDAT") + 4:-16])
    assert raw == b"\x00\x12\x34"
    assert P.decode_png(data)[0, 0, 0] == 0x1234


def test_multi_idat_and_ancillary_chunks():
    """IDAT may be split arbitrarily; unknown ancillary chunks skip."""
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = P.encode_png(img)
    # re-frame: split the IDAT payload into two chunks + insert a tEXt
    sig, rest = data[:8], data[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack_from(">I", rest, pos)
        chunks.append((rest[pos + 4:pos + 8], rest[pos + 8:pos + 8 + ln]))
        pos += 12 + ln
    out = sig
    for ctype, payload in chunks:
        if ctype == b"IDAT":
            out += P._chunk(b"tEXt", b"k\x00v")
            out += P._chunk(b"IDAT", payload[:3])
            out += P._chunk(b"IDAT", payload[3:])
        else:
            out += P._chunk(ctype, payload)
    assert np.array_equal(P.decode_png(out), img)


def test_malformed_inputs_raise():
    img = np.zeros((2, 2, 3), np.uint8)
    data = bytearray(P.encode_png(img))
    with pytest.raises(ValueError, match="not a PNG"):
        P.decode_png(b"JUNK" + bytes(data))
    bad = bytearray(data)
    bad[-18] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        P.decode_png(bytes(bad))
    # unknown interlace method rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 9)
    badi = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + P._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlace"):
        P.decode_png(badi)
    with pytest.raises(ValueError, match="palette"):
        P.encode_png(np.full((1, 1), 9, np.uint8), color_type=3,
                     palette=np.zeros((4, 3), np.uint8))


def test_adam7_interlaced_decode():
    """Adam7 files decode to the same pixels as the progressive scatter
    of their seven passes. The interlaced stream is built INDEPENDENTLY
    here (scalar pass extraction + the scalar reference filter), so the
    decoder's pass geometry and per-pass filtering are both pinned."""
    rng = np.random.default_rng(17)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    for (h, w), ch in [((9, 13), 3), ((8, 8), 1), ((3, 2), 4), ((1, 17), 2)]:
        img = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
        lines = b""
        for pi, (x0, y0, dx, dy) in enumerate(passes):
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            hp, wp = sub.shape[:2]
            raw = sub.reshape(hp, -1)
            prev = bytes(raw.shape[1])
            for r in range(hp):
                ft = (r + pi) % 5
                lines += bytes([ft]) + _ref_filter(ft, bytes(raw[r]), prev, ch)
                prev = bytes(raw[r])
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
        data = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
                + P._chunk(b"IDAT", zlib.compress(lines))
                + P._chunk(b"IEND", b""))
        assert np.array_equal(P.decode_png(data), img), (h, w, ch)


def test_adam7_sixteen_bit_and_subbyte():
    """Adam7 with depth 16 (bpp 2 per sample pair) and depth 1 grey
    (bit-packed pass scanlines with per-pass padding)."""
    rng = np.random.default_rng(23)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    # depth 16 grey
    h, w = 10, 11
    img = rng.integers(0, 65536, size=(h, w, 1)).astype(np.uint16)
    lines = b""
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        hp = sub.shape[0]
        raw = np.ascontiguousarray(sub.astype(">u2")).view(np.uint8).reshape(hp, -1)
        for r in range(hp):
            lines += b"\x00" + raw[r].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 1)
    data = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(lines)) + P._chunk(b"IEND", b""))
    assert np.array_equal(P.decode_png(data), img)
    # depth 1 grey
    img1 = rng.integers(0, 2, size=(9, 10)).astype(np.uint8)
    lines = b""
    for x0, y0, dx, dy in passes:
        sub = img1[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        hp, wp = sub.shape
        stride = (wp + 7) // 8
        for r in range(hp):
            bits = np.zeros(stride * 8, np.uint8)
            bits[:wp] = sub[r]
            lines += b"\x00" + np.packbits(bits).tobytes()
    ihdr = struct.pack(">IIBBBBB", 10, 9, 1, 0, 0, 0, 1)
    data = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(lines)) + P._chunk(b"IEND", b""))
    assert np.array_equal(P.decode_png(data)[:, :, 0], img1)


class TestTrns:
    """tRNS transparency (spec 11.3.2): per-entry alpha for indexed
    images, single transparent-colour key for grey/RGB."""

    @staticmethod
    def _insert_trns(data: bytes, payload: bytes) -> bytes:
        from whitebox_tools_spark.operators.png_codec import _chunk
        # place tRNS right before the first IDAT (after PLTE if any)
        i = data.index(b"IDAT") - 4
        return data[:i] + _chunk(b"tRNS", payload) + data[i:]

    def test_indexed_trns_expands_to_rgba(self):
        import numpy as np
        from whitebox_tools_spark.operators.png_codec import (
            decode_png, encode_png)
        pal = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90]], np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
        data = self._insert_trns(
            encode_png(idx, color_type=3, palette=pal), bytes([0, 128]))
        out = decode_png(data)
        assert out.shape == (2, 3, 4)
        np.testing.assert_array_equal(out[:, :, :3], pal[idx.astype(int)])
        alpha = np.array([[0, 128, 255], [255, 128, 0]], np.uint8)
        np.testing.assert_array_equal(out[:, :, 3], alpha)

    def test_gray_colour_key(self):
        import numpy as np
        from whitebox_tools_spark.operators.png_codec import (
            decode_png, encode_png)
        g = np.array([[7, 8], [8, 9]], np.uint8)
        data = self._insert_trns(encode_png(g), (8).to_bytes(2, "big"))
        out = decode_png(data)
        assert out.shape == (2, 2, 2)
        np.testing.assert_array_equal(out[:, :, 1],
                                      [[255, 0], [0, 255]])

    def test_rgb_colour_key_16bit(self):
        import numpy as np
        from whitebox_tools_spark.operators.png_codec import (
            decode_png, encode_png)
        img = np.zeros((2, 2, 3), np.uint16)
        img[0, 0] = (1000, 2000, 3000)
        key = b"".join(int(v).to_bytes(2, "big") for v in (1000, 2000, 3000))
        out = decode_png(self._insert_trns(encode_png(img), key))
        assert out.shape == (2, 2, 4) and out.dtype == np.uint16
        assert out[0, 0, 3] == 0 and out[0, 1, 3] == 65535

    def test_imageio_indexed_alpha_to_ours(self, spark):
        """A javax-written indexed PNG with per-entry alpha (ICM with
        alpha table) must decode to the same RGBA."""
        import numpy as np
        from whitebox_tools_spark.operators.png_codec import decode_png
        jvm = spark.sparkContext._jvm
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                       np.uint8)
        alpha = np.array([255, 128, 0, 255], np.uint8)
        idx = np.array([[0, 1], [2, 3], [1, 1]], np.uint8)
        h, w = idx.shape
        icm = jvm.java.awt.image.IndexColorModel(
            2, 4,
            bytearray(pal[:, 0].tobytes()), bytearray(pal[:, 1].tobytes()),
            bytearray(pal[:, 2].tobytes()), bytearray(alpha.tobytes()))
        bi = jvm.java.awt.image.BufferedImage(
            w, h, jvm.java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        raster = bi.getRaster()
        for r in range(h):
            for c in range(w):
                raster.setSample(c, r, 0, int(idx[r, c]))
        bos = jvm.java.io.ByteArrayOutputStream()
        assert jvm.javax.imageio.ImageIO.write(bi, "png", bos)
        out = decode_png(bytes(bos.toByteArray()))
        assert out.shape[2] == 4
        np.testing.assert_array_equal(out[:, :, :3], pal[idx.astype(int)])
        np.testing.assert_array_equal(out[:, :, 3], alpha[idx.astype(int)])


# --------------------------------------------------- Adam7 interlaced WRITE


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (7, 7), (8, 8),
                                   (13, 17), (16, 16, 3), (11, 5, 4)])
@pytest.mark.parametrize("ft", [0, 2, 4])
def test_interlaced_write_roundtrip(shape, ft):
    img = RNG.randint(0, 256, shape).astype(np.uint8)
    back = P.decode_png(P.encode_png(img, filter_type=ft, interlace=1))
    want = img if img.ndim == 3 else img[:, :, None]
    assert np.array_equal(back, want)


def test_interlaced_write_16bit_and_indexed():
    img = RNG.randint(0, 65536, (9, 13)).astype(np.uint16)
    back = P.decode_png(P.encode_png(img, interlace=1))
    assert np.array_equal(back[:, :, 0], img)
    pal = RNG.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = RNG.randint(0, 256, (10, 11)).astype(np.uint8)
    back = P.decode_png(P.encode_png(idx, color_type=3, palette=pal,
                                     interlace=1))
    assert np.array_equal(back, pal[idx.astype(np.int64)])


def test_interlace_validation():
    with pytest.raises(ValueError, match="interlace"):
        P.encode_png(np.zeros((4, 4), np.uint8), interlace=2)
