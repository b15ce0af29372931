"""Dependency-free PNG codec (stdlib zlib + numpy), for the 'real'
media decode lane.

Implements the PNG spec (ISO/IEC 15948 / W3C PNG 1.2) subset that covers
actually-common files:

- chunks: IHDR / PLTE / IDAT (multi-chunk) / IEND walked with CRC-32
  validation; ancillary chunks skipped;
- colour types 0 (greyscale), 2 (truecolour), 3 (indexed), 4 (grey +
  alpha), 6 (truecolour + alpha);
- bit depths 8 and 16 everywhere they are legal, plus 1/2/4 for
  greyscale and indexed (bit-unpacked);
- all five scanline filters (None/Sub/Up/Average/Paeth, spec §9):
  Sub is un-filtered with a per-lane modular cumsum, Up with one
  vectorized add, Average/Paeth with a per-pixel-column loop that
  vectorizes across the bpp byte lanes;
- both interlace methods: 0 (none) and 1 (Adam7 seven-pass, spec §8.2
  — each pass an independently-filtered sub-image scattered back).

The encoder writes greyscale / truecolour / indexed / alpha images at
depth 8 or 16 with a selectable per-row filter type, so tests can
roundtrip every filter arm. The reference engine has no PNG path at
all; this lane exists for the training-data pipeline brief.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by colour type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec §9.4), vectorized over byte lanes."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to a raw scanline (encoder side)."""
    r16 = row.astype(np.int16)
    left = np.zeros_like(row)
    left[bpp:] = row[:-bpp]
    if ftype == 0:
        return row
    if ftype == 1:
        return ((r16 - left) % 256).astype(np.uint8)
    if ftype == 2:
        return ((r16 - prev) % 256).astype(np.uint8)
    if ftype == 3:
        return ((r16 - ((left.astype(np.int16) + prev) // 2)) % 256).astype(np.uint8)
    if ftype == 4:
        leftprev = np.zeros_like(prev)
        leftprev[bpp:] = prev[:-bpp]
        pred = _paeth(left, prev.astype(np.uint8), leftprev.astype(np.uint8))
        return ((r16 - pred) % 256).astype(np.uint8)
    raise ValueError(f"bad PNG filter type {ftype}")


def _unfilter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reconstruct one scanline in place (decoder side, spec §9)."""
    if ftype == 0:
        return row
    if ftype == 2:  # Up: fully vectorized
        return (row + prev).astype(np.uint8)
    if ftype == 1:  # Sub: per-lane modular prefix sum
        # stride is always a multiple of bpp (bpp=1 for sub-byte depths)
        lanes = row.reshape(-1, bpp).astype(np.uint64)
        acc = np.cumsum(lanes, axis=0) & 0xFF
        return acc.astype(np.uint8).reshape(-1)
    # Average / Paeth: sequential along x; loop pixel columns,
    # vectorize across the bpp byte lanes
    out = row.copy()
    if ftype == 3:
        for x in range(0, row.size, bpp):
            left = out[x - bpp:x] if x else np.zeros(bpp, np.uint8)
            avg = (left.astype(np.int16) + prev[x:x + bpp].astype(np.int16)) // 2
            out[x:x + bpp] = (out[x:x + bpp] + avg).astype(np.uint8)
        return out
    if ftype == 4:
        zero = np.zeros(bpp, np.uint8)
        for x in range(0, row.size, bpp):
            left = out[x - bpp:x] if x else zero
            up = prev[x:x + bpp].astype(np.uint8)
            upleft = prev[x - bpp:x].astype(np.uint8) if x else zero
            out[x:x + bpp] = (
                out[x:x + bpp] + _paeth(left, up, upleft)
            ).astype(np.uint8)
        return out
    raise ValueError(f"bad PNG filter type {ftype}")


def encode_png(
    img: np.ndarray,
    color_type: int | None = None,
    palette: np.ndarray | None = None,
    filter_type: int = 0,
    interlace: int = 0,
) -> bytes:
    """Encode an image as PNG.

    ``img``: (h, w) or (h, w, ch) uint8, or uint16 for 16-bit output.
    ``color_type``: inferred from the channel count when None (1 -> 0
    grey, 2 -> 4 grey+alpha, 3 -> 2 RGB, 4 -> 6 RGBA); pass 3 with a
    ``palette`` (n<=256, 3) uint8 to write an indexed image from a
    (h, w) uint8 index grid. ``filter_type`` applies one spec filter to
    every scanline (0-4), so tests can pin each decode arm.
    ``interlace=1`` writes Adam7 (spec §8.2: seven sub-images, filter
    state resets per pass — 8/16-bit samples only here; sub-byte
    interlaced packing is a read-side-only case).
    """
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError("encode_png expects uint8 or uint16")
    depth = 8 if img.dtype == np.uint8 else 16
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if color_type == 3:
        if palette is None or img.dtype != np.uint8 or ch != 1:
            raise ValueError("indexed PNG needs a uint8 index grid + palette")
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("index grid references beyond the palette")
    if _CHANNELS[color_type] != ch:
        raise ValueError(f"colour type {color_type} expects {_CHANNELS[color_type]} channels")
    if depth not in _LEGAL_DEPTHS[color_type]:
        raise ValueError(f"depth {depth} illegal for colour type {color_type}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0-4")
    if interlace not in (0, 1):
        raise ValueError("interlace must be 0 (none) or 1 (Adam7)")

    bpp = ch * depth // 8

    def _pass_lines(sub: np.ndarray) -> list[bytes]:
        if depth == 16:
            raw = np.ascontiguousarray(sub.astype(">u2")).view(
                np.uint8).reshape(sub.shape[0], -1)
        else:
            raw = np.ascontiguousarray(sub).reshape(sub.shape[0], -1)
        prev = np.zeros(raw.shape[1], dtype=np.int16)
        out = []
        for r in range(raw.shape[0]):
            row = raw[r]
            out.append(bytes([filter_type]) + _filter_row(
                filter_type, row, prev, bpp).tobytes())
            prev = row.astype(np.int16)
        return out

    if interlace == 0:
        lines = _pass_lines(img)
    else:
        lines = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines.extend(_pass_lines(sub))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
    out += _chunk(b"IEND", b"")
    return out


def _unpack_bits(data: np.ndarray, depth: int, n: int) -> np.ndarray:
    """Unpack 1/2/4-bit samples (MSB-first within each byte, spec §7.2)
    to one uint8 per sample, truncated to ``n`` samples."""
    bits = np.unpackbits(data)
    samples = bits.reshape(-1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (samples * weights).sum(axis=1).astype(np.uint8)
    return vals[:n]


# Adam7 pass origins and steps (spec §8.2): (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter_image(
    raw: bytes, off: int, h: int, stride: int, bpp: int
) -> tuple[np.ndarray, int]:
    """Reconstruct ``h`` scanlines of ``stride`` bytes starting at
    ``off`` in the decompressed stream; returns (rows, next offset)."""
    need = h * (stride + 1)
    if off + need > len(raw):
        raise ValueError("PNG: IDAT length does not match dimensions")
    buf = np.frombuffer(raw, np.uint8, count=need, offset=off).reshape(
        h, stride + 1)
    prev = np.zeros(stride, dtype=np.int16)
    rows = np.empty((h, stride), dtype=np.uint8)
    for r in range(h):
        rec = _unfilter_row(int(buf[r, 0]), buf[r, 1:].copy(), prev, bpp)
        rows[r] = rec
        prev = rec.astype(np.int16)
    return rows, off + need


def _rows_to_samples(
    rows: np.ndarray, w: int, ch: int, depth: int
) -> np.ndarray:
    """Reconstructed scanline bytes -> (h, w, ch) sample array (uint8,
    or uint16 for depth 16; sub-byte depths unpacked, not rescaled)."""
    h = rows.shape[0]
    if depth == 16:
        return rows.reshape(h, -1).view(">u2").astype(np.uint16).reshape(h, w, ch)
    if depth == 8:
        return rows.reshape(h, w, ch)
    img = np.empty((h, w), dtype=np.uint8)
    for r in range(h):
        img[r] = _unpack_bits(rows[r], depth, w)
    return img[:, :, None]


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes.

    Returns (h, w, ch) with the image's natural channels — grey 1, grey+
    alpha 2, RGB 3, RGBA 4; indexed images are expanded through PLTE to
    RGB, or RGBA when a tRNS chunk carries per-entry alpha; grey/RGB
    files with a tRNS transparent-colour key gain an alpha channel
    (0 at the key, opaque elsewhere). dtype uint8 (depths 1/2/4 are
    unpacked but NOT rescaled — a 1-bit white pixel decodes to 1,
    matching the raw sample value), uint16 for depth-16 files. Both
    interlace methods decode (0 = none, 1 = Adam7 seven-pass).
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    palette = None
    trns = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    if color_type not in _CHANNELS or depth not in _LEGAL_DEPTHS[color_type]:
        raise ValueError(f"PNG: illegal depth/colour combo ({depth}, {color_type})")
    ch = _CHANNELS[color_type]

    raw = zlib.decompress(b"".join(idat))
    bits_per_pixel = ch * depth
    bpp = max(1, bits_per_pixel // 8)  # filter distance, spec §9

    if interlace == 0:
        stride = (w * bits_per_pixel + 7) // 8  # per scanline, sans filter byte
        rows, end = _unfilter_image(raw, 0, h, stride, bpp)
        if end != len(raw):
            raise ValueError("PNG: IDAT length does not match dimensions")
        img = _rows_to_samples(rows, w, ch, depth)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        dt = np.uint16 if depth == 16 else np.uint8
        img = np.zeros((h, w, ch), dtype=dt)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            stride = (wp * bits_per_pixel + 7) // 8
            rows, off = _unfilter_image(raw, off, hp, stride, bpp)
            img[y0::dy, x0::dx] = _rows_to_samples(rows, wp, ch, depth)
        if off != len(raw):
            raise ValueError("PNG: IDAT length does not match dimensions")

    if color_type == 3:
        if palette is None:
            raise ValueError("indexed PNG missing PLTE")
        idx = img[:, :, 0].astype(np.int64)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("PNG palette index out of range")
        img = palette[idx]
        if trns is not None:  # per-palette-entry alpha -> RGBA
            alpha = np.full(len(palette), 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            img = np.concatenate([img, alpha[idx][:, :, None]], axis=2)
    elif trns is not None and color_type in (0, 2):
        # single transparent colour (16-bit sample fields, spec 11.3.2)
        vals = np.frombuffer(trns, ">u2").astype(np.int64)
        if depth < 16:
            vals = vals & ((1 << depth) - 1)
        key = vals[: ch].reshape(1, 1, ch)
        mask = (img.astype(np.int64) == key).all(axis=2)
        amax = 65535 if depth == 16 else 255
        alpha = np.where(mask, 0, amax).astype(img.dtype)
        img = np.concatenate([img, alpha[:, :, None]], axis=2)
    return img
