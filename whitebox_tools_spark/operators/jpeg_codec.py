"""Dependency-free baseline JPEG codec (numpy), for the 'real' media
decode lane.

Implements the ITU-T T.81 DCT processes, 8-bit:

- markers: SOI / APP0(JFIF) / DQT / SOF0/1/2 / DHT / DRI / SOS / RSTn /
  EOI (APPn/COM skipped); lossless (SOF3), hierarchical and arithmetic
  coding raise NotImplementedError at the documented point;
- decode covers BOTH the baseline sequential process and the
  progressive process (T.81 Annex G: spectral selection + successive
  approximation — interleaved/single-component DC first + refinement,
  per-component AC first + refinement with EOB runs), the dominant
  shape of web JPEGs; scans accumulate into a zigzag coefficient
  buffer and one vectorized batch IDCT reconstructs at EOI;
- entropy coding: canonical Huffman per Annex C, byte stuffing (FF 00),
  DC differential + AC run/size with ZRL and EOB, restart-interval DC
  predictor resets;
- transform: 8x8 DCT-II / DCT-III as exact float64 matrix products;
  quantization with the Annex K example tables scaled by the libjpeg
  quality formula;
- colour: grayscale (1 component) and YCbCr (3 components); the encoder
  writes 4:4:4, the decoder also upsamples 4:2:0 / 4:2:2 / 4:4:0 by
  sample replication; JFIF full-range BT.601 colour conversion.

JPEG is lossy, so the oracle-checkable catalog row uses flat grayscale
images: a flat 8x8 block has only a DC coefficient, every AC quantizes
to zero, and the decoded constant is the closed form
clamp(round(qDC * round(8*(v-128)/qDC) / 8) + 128) — exactly
reproducible in SQL, so the row pins the whole container + Huffman +
quantize + IDCT chain with an exact value hash, not a tolerance. The
full AC path is covered by pytest roundtrip-error bounds and an
independent scalar reference in tests. The reference engine has no
JPEG path at all; this lane exists for the training-data pipeline
brief.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order (T.81 Figure 5): _ZIGZAG[k] = raster index of the
# k-th zigzag position
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 example quantization tables (raster order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis matrix M: coefs = M @ block @ M.T (orthonormal)."""
    k = np.arange(8, dtype=np.float64)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0, :] = 1.0
    scale = np.full((8, 1), 0.5)
    scale[0, 0] = 1.0 / (2 * np.sqrt(2.0))
    return m * scale


_M = _dct_matrix()


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: q50 tables scaled, clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1-100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * s + 50) // 100
    return np.clip(t, 1, 255)


# ------------------------------------------------------------ bit writer


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length) (Annex C)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC value (F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------- encoder


def _encode_block(bw, zz, pred, ci, dc_tab, ac_tab):
    """Entropy-encode one zigzagged quantized block (F.1.2)."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size, bits = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.put(code, ln)
    if size:
        bw.put(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        bw.put(code, ln)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JPEG
    (Annex K tables scaled to ``quality``). ``subsampling`` is '444'
    (every component full resolution) or '420' (chroma 2x2-averaged,
    the common camera default). ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects (h, w) or (h, w, 3) uint8")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("encode_jpeg expects 3 channels for colour")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        sampling = [(1, 1)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        if subsampling == "420":
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            sampling = [(1, 1), (1, 1), (1, 1)]
    qt = [scaled_quant_table(_Q_LUMA, quality)]
    if not gray:
        qt.append(scaled_quant_table(_Q_CHROMA, quality))

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per component: edge-pad the full plane to the MCU grid, then
    # downsample by block averaging to its sampling resolution
    comp_planes = []
    for (sh, sv), p in zip(sampling, planes):
        fh, fw = mcuy * vmax * 8, mcux * hmax * 8
        pp = np.empty((fh, fw), np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1:w]
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:
            pp = pp.reshape(fh // fy, fy, fw // fx, fx).mean(axis=(1, 3))
        comp_planes.append(pp)

    dc_tabs = [_huff_codes(*_DC_LUMA)]
    ac_tabs = [_huff_codes(*_AC_LUMA)]
    if not gray:
        dc_tabs.append(_huff_codes(*_DC_CHROMA))
        ac_tabs.append(_huff_codes(*_AC_CHROMA))

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * len(planes)
            for ci, ((sh, sv), p) in enumerate(zip(sampling, comp_planes)):
                ti = 0 if ci == 0 else 1
                for vy in range(sv):
                    for vx in range(sh):
                        by = (my * sv + vy) * 8
                        bx = (mx * sh + vx) * 8
                        block = p[by:by + 8, bx:bx + 8] - 128.0
                        coef = _M @ block @ _M.T
                        q = np.round(coef.reshape(-1) / qt[ti]).astype(np.int64)
                        _encode_block(bw, q[_ZIGZAG], pred, ci,
                                      dc_tabs[ti], ac_tabs[ti])
            mcu_count += 1
    bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    # DQT
    for i, t in enumerate(qt):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, i) + bytes(
            int(t[z]) for z in _ZIGZAG)
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        out += struct.pack("BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    # DHT
    def dht(cls: int, tid: int, table: tuple) -> bytes:
        bits, values = table
        return (b"\xFF\xC4" + struct.pack(">HB", 19 + len(values),
                                          (cls << 4) | tid)
                + bytes(bits) + bytes(values))
    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        out += struct.pack("BB", ci + 1, (tid << 4) | tid)
    out += b"\x00\x3F\x00"  # Ss, Se, Ah/Al
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at markers
    (returns them via .marker)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.n <= 24:
            if self.marker is not None or self.pos + 1 >= len(self.data):
                self.acc = (self.acc << 8) | 0  # feed zeros past marker/EOF
                self.n += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        self.acc = 0
        self.n = 0
        # skip to the marker position and past it
        end = len(self.data) - 1
        if self.marker is None:
            # find it (we may not have hit it while filling yet)
            while self.pos < end and (
                self.data[self.pos] != 0xFF
                or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
            ):
                self.pos += 1
        else:
            while self.pos < end and (
                self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != self.marker
            ):
                self.pos += 1
        if self.pos >= end:
            raise ValueError("JPEG: truncated scan (missing RSTn marker)")
        self.pos += 2
        self.marker = None


class _HuffDecoder:
    """Canonical Huffman decode tables: per code length, the min code and
    the value index range (fast range compare per F.2.2.3)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = values
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.bits(1)
        ln = 1
        while code > self.maxcode[ln]:
            if ln >= 16:
                raise ValueError("JPEG: invalid Huffman code")
            code = (code << 1) | br.bits(1)
            ln += 1
        return self.values[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, size: int) -> int:
    """Sign-extend appended bits (F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _parse_tables_stream(
    tables: bytes,
    qt: dict[int, np.ndarray],
    huff: dict[tuple[int, int], "_HuffDecoder"],
) -> int:
    """Parse a tables-only JPEG stream (T.81 §B.5 abbreviated format —
    the payload of the TIFF ``JPEGTables`` tag 347): collect DQT / DHT
    (and a DRI default) into the caller's dicts. Returns the restart
    interval (0 if none). Frame/scan markers are illegal here."""
    if tables[:2] != b"\xFF\xD8":
        raise ValueError("JPEGTables: not a JPEG tables stream")
    pos = 2
    restart_interval = 0
    while pos < len(tables):
        if tables[pos] != 0xFF:
            raise ValueError("JPEGTables: expected marker")
        marker = tables[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI ends the abbreviated stream
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue
        (seglen,) = struct.unpack_from(">H", tables, pos)
        seg = tables[pos + 2:pos + seglen]
        if marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xC4:
            _parse_dht(seg, huff)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif 0xC0 <= marker <= 0xCF:
            raise ValueError(
                "JPEGTables: frame marker in a tables-only stream")
        pos += seglen
    return restart_interval


def _parse_dqt(seg: bytes, qt: dict[int, np.ndarray]) -> None:
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 0xF
        p += 1
        if pq == 0:
            t = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
            p += 64
        else:
            t = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
            p += 128
        raster = np.empty(64, np.int64)
        raster[_ZIGZAG] = t
        qt[tq] = raster


def _parse_dht(seg: bytes, huff: dict[tuple[int, int], "_HuffDecoder"]) -> None:
    p = 0
    while p < len(seg):
        cls, tid = seg[p] >> 4, seg[p] & 0xF
        bits = list(seg[p + 1:p + 17])
        n = sum(bits)
        values = list(seg[p + 17:p + 17 + n])
        huff[(cls, tid)] = _HuffDecoder(bits, values)
        p += 17 + n


def decode_jpeg(data: bytes, tables: bytes | None = None) -> np.ndarray:
    """Decode JPEG bytes -> (h, w) grayscale has shape (h, w, 1); colour
    decodes to (h, w, 3) RGB uint8 (JFIF BT.601). Both the baseline
    sequential (SOF0/1) and the progressive (SOF2) DCT processes decode
    — progressive accumulates spectral-selection / successive-
    approximation scans (T.81 Annex G: DC first + refine, AC first +
    refine with EOB runs) into the coefficient buffer and reconstructs
    once at EOI. ``tables`` primes the decoder with a tables-only
    abbreviated stream (TIFF JPEGTables tag 347, TechNote 2) so that
    ``data`` may be an abbreviated image stream whose DQT/DHT live in
    the shared tables; in-stream tables still override."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG file")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    sof = None
    progressive = False
    restart_interval = 0
    if tables is not None:
        restart_interval = _parse_tables_stream(tables, qt, huff)
    coefs: list[np.ndarray] | None = None
    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec, hh, ww, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"JPEG: {nc}-component images not supported "
                    "(grayscale or YCbCr only; CMYK/YCCK not handled)")
            comps = []
            for ci in range(nc):
                cid, samp, tq = struct.unpack_from("BBB", seg, 6 + 3 * ci)
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            sof = (hh, ww, comps)
            progressive = marker == 0xC2
            coefs = _alloc_coefs(sof)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/hierarchical/arithmetic JPEG not supported "
                f"(SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if sof is None or coefs is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                scan.append((cs, tabs >> 4, tabs & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive:
                if ns != len(sof[2]):
                    raise NotImplementedError(
                        "JPEG: non-interleaved multi-scan baseline not "
                        f"supported (scan covers {ns} of {len(sof[2])} "
                        "components)")
                _decode_scan_baseline(data, pos + seglen, sof, scan, huff,
                                      restart_interval, coefs)
                saw_scan = True
                break  # baseline: one complete scan
            pos = _decode_scan_progressive(
                data, pos + seglen, sof, scan, (ss, se, ah, al), huff,
                restart_interval, coefs)
            saw_scan = True
            continue
        pos += seglen
    if sof is None or coefs is None or not saw_scan:
        raise ValueError("JPEG: no scan data")
    return _reconstruct(sof, coefs, qt)


def _geometry(sof):
    h, w, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _true_block_dims(sof, c):
    """Non-interleaved scan coverage: the component's OWN block grid
    (ceil of its sample dims / 8), not the MCU-padded grid (T.81 A.2.2)."""
    h, w, _ = sof
    hmax, vmax, _, _ = _geometry(sof)
    cw = (w * c["h"] + hmax - 1) // hmax
    chh = (h * c["v"] + vmax - 1) // vmax
    return (chh + 7) // 8, (cw + 7) // 8


def _alloc_coefs(sof) -> list[np.ndarray]:
    """One zigzag-ordered int32 coefficient cube per component, on the
    MCU-padded block grid (covers interleaved and non-interleaved
    scans; pad blocks stay zero and are cropped after IDCT)."""
    _, _, comps = sof
    hmax, vmax, mcux, mcuy = _geometry(sof)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32) for c in comps
    ]


def _decode_scan_baseline(data, pos, sof, scan, huff, restart_interval,
                          coefs):
    """Baseline sequential scan: every component, full spectral range,
    one pass. Fills ``coefs`` with quantized zigzag coefficients."""
    h, w, comps = sof
    hmax, vmax, mcux, mcuy = _geometry(sof)
    by_id = {c["id"]: (i, c) for i, c in enumerate(comps)}
    order = []
    for cs, td, ta in scan:
        i, c = by_id[cs]
        order.append((i, c, huff[(0, td)], huff[(1, ta)]))
    pred = [0] * len(order)
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(order)
            for si, (ci, c, dct_, act_) in enumerate(order):
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = coefs[ci][my * c["v"] + vy, mx * c["h"] + vx]
                        size = dct_.decode(br)
                        diff = _extend(br.bits(size), size)
                        pred[si] += diff
                        zz[0] = pred[si]
                        k = 1
                        while k < 64:
                            rs = act_.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
            mcu_count += 1


def _refine_nonzero(br, zz, k, p1):
    """Apply one correction bit to an already-nonzero coefficient
    (G.2.2.3; abs() form is exact because every stored value is a
    multiple of p1)."""
    if br.bits(1) and (abs(int(zz[k])) & p1) == 0:
        zz[k] += p1 if zz[k] > 0 else -p1


def _decode_scan_progressive(data, pos, sof, scan, band, huff,
                             restart_interval, coefs):
    """One progressive scan (T.81 Annex G): spectral band [Ss, Se] at
    successive-approximation stage Ah -> Al. Returns the byte offset of
    the next marker after the scan's entropy data."""
    ss, se, ah, al = band
    h, w, comps = sof
    hmax, vmax, mcux, mcuy = _geometry(sof)
    by_id = {c["id"]: (i, c) for i, c in enumerate(comps)}
    br = _BitReader(data, pos)

    if ss == 0:  # DC scan: ns components, interleaved MCU order
        if se != 0:
            raise ValueError("JPEG: progressive scan mixes DC and AC")
        order = [(by_id[cs][0], by_id[cs][1], huff.get((0, td)))
                 for cs, td, _ta in scan]
        interleaved = len(order) > 1
        pred = [0] * len(order)
        count = 0

        def dc_block(si, zz):
            if ah == 0:  # first DC scan
                dct_ = order[si][2]
                size = dct_.decode(br)
                pred[si] += _extend(br.bits(size), size)
                zz[0] = pred[si] << al
            else:  # refinement: one bit
                zz[0] |= br.bits(1) << al

        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and count and count % restart_interval == 0:
                        br.restart()
                        pred = [0] * len(order)
                    for si, (ci, c, _t) in enumerate(order):
                        for vy in range(c["v"]):
                            for vx in range(c["h"]):
                                dc_block(si, coefs[ci][my * c["v"] + vy,
                                                       mx * c["h"] + vx])
                    count += 1
        else:
            ci, c, _t = order[0]
            bh, bw = _true_block_dims(sof, c)
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and count and count % restart_interval == 0:
                        br.restart()
                        pred = [0] * len(order)
                    dc_block(0, coefs[ci][by, bx])
                    count += 1
    else:  # AC scan: exactly one component (T.81 G.1.1.1.1)
        if len(scan) != 1:
            raise ValueError("JPEG: interleaved progressive AC scan")
        cs, _td, ta = scan[0]
        ci, c = by_id[cs]
        act_ = huff[(1, ta)]
        bh, bw = _true_block_dims(sof, c)
        eobrun = 0
        p1 = 1 << al
        count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and count and count % restart_interval == 0:
                    br.restart()
                    eobrun = 0
                count += 1
                zz = coefs[ci][by, bx]
                if ah == 0:  # AC first scan
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = act_.decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG: AC index overflow")
                        zz[k] = _extend(br.bits(s), s) << al
                        k += 1
                else:  # AC refinement scan (G.2.2.3)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = act_.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            val = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = (1 << r)
                                    if r:
                                        eobrun += br.bits(r)
                                    break
                                # r == 15: pass over 16 zero-history coefs
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "JPEG: bad refinement magnitude")
                                val = p1 if br.bits(1) else -p1
                            while k <= se:
                                if zz[k] != 0:
                                    _refine_nonzero(br, zz, k, p1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                zz[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if zz[k] != 0:
                                _refine_nonzero(br, zz, k, p1)
                            k += 1
                        eobrun -= 1

    # locate the next marker after this scan's entropy bytes (skip
    # stuffed FF00, RSTn consumed as data, and FF fill bytes)
    p = br.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF) and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


def _reconstruct(sof, coefs, qt):
    """Dequantize + batch IDCT + upsample + colour-convert the
    accumulated coefficient cubes into the final image."""
    h, w, comps = sof
    hmax, vmax, _, _ = _geometry(sof)
    full = []
    for c, cube in zip(comps, coefs):
        bh, bw, _ = cube.shape
        q = qt[c["tq"]]  # raster-ordered
        deq = np.zeros((bh, bw, 64), np.float64)
        # cube is zigzag-ordered; matching quant steps are q[_ZIGZAG]
        deq[:, :, _ZIGZAG] = cube * q[_ZIGZAG].astype(np.float64)
        blocks = deq.reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _M.T, blocks, _M) + 128.0
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        full.append(plane[:h, :w])
    # final sample rounding is floor(x + 0.5) (libjpeg's DESCALE), not
    # banker's np.round: half-way cases round up, which is also what SQL
    # round()/floor(x+0.5) computes — keeps the flat-gray oracle exact
    if len(full) == 1:
        out = np.clip(np.floor(full[0] + 0.5), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
