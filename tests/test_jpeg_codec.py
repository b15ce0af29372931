"""Baseline JPEG codec (operators/jpeg_codec.py).

JPEG is lossy, so the laws are: (a) the flat-image DC chain is EXACT
and matches independent rational arithmetic (the oracle row's closed
form, checked for all 256 gray values); (b) at quality 100 every
quantizer step is 1, so roundtrip error is bounded by pure DCT/IDCT
rounding (<= 2); (c) decode is deterministic and restart-marker /
subsampling variants decode to the same pixels as their plain
counterparts; (d) malformed / unsupported inputs raise at documented
points."""

from fractions import Fraction

import numpy as np
import pytest

from whitebox_tools_spark.operators import jpeg_codec as J


def _rnd_away(f: Fraction) -> int:
    return int(f + Fraction(1, 2)) if f >= 0 else -int(-f + Fraction(1, 2))


def test_flat_gray_matches_exact_rational_closed_form():
    """The media_decode_jpeg oracle law: for EVERY v in 0..255 the
    decoded flat image equals clamp(round(q*round(8(v-128)/q)/8 + 128))
    computed in exact rational arithmetic, and no rounding ties exist
    (so SQL half-away and numpy cannot diverge)."""
    q = int(J.scaled_quant_table(J._Q_LUMA, 90)[0])
    assert q == 3  # the oracle SQL hard-codes qDC=3 at quality 90
    for v in range(256):
        img = np.full((8, 16), v, np.uint8)  # 2 blocks: DC diff exercised
        out = J.decode_jpeg(J.encode_jpeg(img, quality=90))
        kf = Fraction(8 * (v - 128), q)
        k = _rnd_away(kf)
        assert abs(kf - k) != Fraction(1, 2), v  # quantize tie-free
        val = Fraction(q * k, 8) + 128
        assert val - int(val) != Fraction(1, 2), v  # pixel tie-free
        want = min(255, max(0, _rnd_away(val)))
        assert (out == want).all(), (v, int(out[0, 0, 0]), want)


def test_quality100_roundtrip_error_bound():
    """q100 => all quant steps 1: error is pure transform rounding."""
    rng = np.random.default_rng(4)
    for shape in [(1, 1), (7, 5), (9, 17), (16, 16), (24, 16, 3)]:
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=100))
        if img.ndim == 2:
            out = out[:, :, 0]
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 2, (shape, err)
        assert out.shape[:2] == img.shape[:2]


def test_smooth_gradient_quality95():
    g = np.clip(np.add.outer(np.arange(16) * 3, np.arange(24) * 2),
                0, 255).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(g, quality=95))[:, :, 0]
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 6


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, size=(40, 40)).astype(np.uint8)
    a = J.decode_jpeg(J.encode_jpeg(g, quality=80))
    data = J.encode_jpeg(g, quality=80, restart_interval=3)
    assert b"\xFF\xDD" in data and b"\xFF\xD0" in data  # DRI + RST0
    assert np.array_equal(J.decode_jpeg(data), a)


def test_420_subsampling_decodes_and_matches_shape():
    x = np.linspace(0, 255, 32).astype(np.uint8)
    img = np.zeros((24, 32, 3), np.uint8)
    img[:, :, 0] = x[None, :]
    img[:, :, 1] = np.linspace(0, 255, 24).astype(np.uint8)[:, None]
    img[:, :, 2] = 100
    for ri in (0, 2):
        out = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsampling="420",
                                          restart_interval=ri))
        assert out.shape == img.shape
        # luma survives almost exactly; chroma is 2x2-averaged+replicated
        y_in = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        y_out = (0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2])
        assert np.abs(y_in - y_out).max() <= 8


def test_huffman_tables_are_canonical():
    """Annex K tables must satisfy the canonical-code invariants (codes
    fit their bit lengths; Kraft sum <= 1) — a transcription typo in the
    table data would break this before it broke a roundtrip."""
    for bits, values in (J._DC_LUMA, J._DC_CHROMA, J._AC_LUMA, J._AC_CHROMA):
        assert sum(bits) == len(values)
        codes = J._huff_codes(bits, values)
        assert len(codes) == len(values)  # no duplicate symbols
        kraft = sum(Fraction(1, 2 ** ln) for _, ln in codes.values())
        assert kraft <= 1
        for code, ln in codes.values():
            assert 0 <= code < (1 << ln)
            assert code != (1 << ln) - 1 or ln == 16 or kraft < 1
    # decoder tables invert the encoder tables symbol-for-symbol
    enc = J._huff_codes(*J._AC_LUMA)
    dec = J._HuffDecoder(*J._AC_LUMA)

    class _Bits:
        def __init__(self, code, ln):
            self.v = [(code >> (ln - 1 - i)) & 1 for i in range(ln)]
            self.i = 0

        def bits(self, k):
            out = 0
            for _ in range(k):
                out = (out << 1) | self.v[self.i]
                self.i += 1
            return out

    for sym, (code, ln) in enc.items():
        assert dec.decode(_Bits(code, ln)) == sym


def test_dct_matrix_is_orthonormal():
    """IDCT (M.T @ . @ M) exactly inverts the DCT (M @ . @ M.T)."""
    ident = J._M @ J._M.T
    np.testing.assert_allclose(ident, np.eye(8), atol=1e-14)


def test_unsupported_and_malformed_raise():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(J.encode_jpeg(img))
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"XX" + bytes(data))
    # a baseline full-band scan relabeled SOF2 is malformed progressive
    # (a progressive scan may not mix DC and AC, T.81 G.1.1.1.1)
    i = bytes(data).index(b"\xFF\xC0")
    prog = bytes(data[:i]) + b"\xFF\xC2" + bytes(data[i + 2:])
    with pytest.raises(ValueError, match="mixes DC and AC"):
        J.decode_jpeg(prog)
    # lossless SOF3 stays the documented NotImplementedError
    lossless = bytes(data[:i]) + b"\xFF\xC3" + bytes(data[i + 2:])
    with pytest.raises(NotImplementedError, match="lossless"):
        J.decode_jpeg(lossless)
    with pytest.raises(ValueError):
        J.encode_jpeg(img.astype(np.uint16))
    with pytest.raises(ValueError, match="quality"):
        J.scaled_quant_table(J._Q_LUMA, 0)


def test_byte_stuffing_roundtrip():
    """Entropy bytes equal to 0xFF must be stuffed with 0x00 and
    transparently unstuffed: a high-entropy image at q100 produces many
    0xFF entropy bytes (statistically certain at this size)."""
    rng = np.random.default_rng(12)
    g = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    data = J.encode_jpeg(g, quality=100)
    sos = data.index(b"\xFF\xDA")
    assert b"\xFF\x00" in data[sos:]
    out = J.decode_jpeg(data)[:, :, 0]
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2


# ---------------------------------------------------------------- round 5
# regression tests for the dequantization-order fix and the malformed /
# unsupported-input hardening (code-review findings on the round-5 diff)


def test_quality75_dequant_uses_raster_order_table():
    """The decoder must multiply zigzag-ordered coefficients by
    q[_ZIGZAG], not q (the DQT parse stores tables in raster order).
    With the orders mixed up, a q75 roundtrip of random gray content
    shows max error ~138; correct dequantization keeps it ~27. q100
    cannot catch this (every step is 1), so pin q75 explicitly."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quality=75))[:, :, 0]
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 40, err
    # smooth content quantizes almost exactly at q75
    gx = np.linspace(0, 255, 32)
    grad = np.clip((gx[None, :] + gx[:, None]) / 2, 0, 255).astype(np.uint8)
    out2 = J.decode_jpeg(J.encode_jpeg(grad, quality=75))[:, :, 0]
    assert np.abs(out2.astype(int) - grad.astype(int)).max() <= 4
    # colour 4:4:4 (4:2:0 chroma averaging on noise is legitimately lossy)
    imc = rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
    oc = J.decode_jpeg(J.encode_jpeg(imc, quality=75, subsampling="444"))
    assert np.abs(oc.astype(int) - imc.astype(int)).max() <= 100


def test_truncated_restart_scan_raises_valueerror():
    """Cutting a restart-interval scan mid-stream must raise the
    documented ValueError, not an IndexError from the marker scan."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    data = J.encode_jpeg(img, quality=75, restart_interval=1)
    for frac in (0.5, 0.7, 0.9):
        with pytest.raises(ValueError):
            J.decode_jpeg(data[: int(len(data) * frac)])


def test_four_component_sof_raises_notimplemented():
    """Adobe CMYK/YCCK baseline (SOF0 nc=4) must fail at the SOF parse
    with a clear NotImplementedError, not an unpack error later."""
    import struct

    sof_body = struct.pack(">BHHB", 8, 8, 8, 4) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1, 4, 0x11, 1]
    )
    data = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    )
    with pytest.raises(NotImplementedError, match="4-component"):
        J.decode_jpeg(data)


def test_non_interleaved_multiscan_raises_notimplemented():
    """A legal baseline file with one scan per component (SOS covers 1
    of 3 SOF components) must raise instead of mis-decoding the first
    scan with interleaved-MCU geometry."""
    import struct

    sof_body = struct.pack(">BHHB", 8, 8, 8, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos_body = bytes([1, 1, 0x00, 0, 63, 0])  # ns=1: component 1 only
    data = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
        + b"\xff\xda" + struct.pack(">H", 2 + len(sos_body)) + sos_body
    )
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        J.decode_jpeg(data)


# ----------------------------------------- abbreviated streams (JPEGTables)


def _split_tables(stream: bytes):
    import struct as _s

    tables = bytearray(b"\xFF\xD8")
    image = bytearray(b"\xFF\xD8")
    pos = 2
    while pos < len(stream):
        marker = stream[pos + 1]
        if marker == 0xD9:
            image += stream[pos:pos + 2]
            break
        if marker == 0xDA:
            image += stream[pos:]
            break
        (seglen,) = _s.unpack_from(">H", stream, pos + 2)
        seg = stream[pos:pos + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else image).extend(seg)
        pos += 2 + seglen
    tables += b"\xFF\xD9"
    return bytes(tables), bytes(image)


def test_tables_param_decodes_abbreviated_stream():
    # T.81 §B.5 / TIFF TechNote 2: DQT+DHT in a tables-only stream,
    # image stream abbreviated — decode must match the full stream
    rng = np.random.RandomState(11)
    for shape in ((24, 16), (24, 16, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        full = J.encode_jpeg(img, quality=80)
        tables, abbrev = _split_tables(full)
        want = J.decode_jpeg(full)
        got = J.decode_jpeg(abbrev, tables=tables)
        assert np.array_equal(got, want)
        # in-stream tables take precedence: full stream + tables is fine
        assert np.array_equal(J.decode_jpeg(full, tables=tables), want)


def test_abbreviated_stream_without_tables_raises():
    img = np.full((8, 8), 77, np.uint8)
    _, abbrev = _split_tables(J.encode_jpeg(img))
    with pytest.raises(Exception):
        J.decode_jpeg(abbrev)


def test_tables_stream_with_frame_marker_rejected():
    img = np.full((8, 8), 77, np.uint8)
    full = J.encode_jpeg(img)
    with pytest.raises(ValueError, match="tables-only"):
        J.decode_jpeg(full, tables=full)
