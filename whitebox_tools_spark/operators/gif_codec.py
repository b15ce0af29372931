"""Dependency-free GIF codec (pure numpy + stdlib), for the 'real'
media decode lane — the animated-frame format.

Implements the GIF87a/89a specification subset that covers real files:

- header + Logical Screen Descriptor, global and local colour tables
  (any power-of-two size 2..256);
- image blocks at any (left, top, w, h) placement on the logical
  screen, interlaced (four-pass) or sequential;
- GIF-variant LZW decompression: LSB-first bit packing, variable code
  width from ``min_code_size + 1`` up to 12 bits, CLEAR / EOI codes,
  the KwKwK self-referencing case, and the *deferred clear* behaviour
  (a full table stays static until the encoder sends CLEAR);
- 89a extensions: Graphic Control (per-frame delay, transparency
  index, disposal methods 0-3 including restore-to-background and
  restore-to-previous compositing), Netscape looping, comment and
  plain-text blocks skipped structurally;
- the encoder writes animated (or single-frame) GIFs from uint8 index
  grids + a palette, full LZW with table reset at 4096 codes, optional
  interlace, per-frame delays.

Every frame decodes to the *composited* full logical screen — the
sequence a video frame-sampler actually wants — so this codec makes
the training-data pipeline's frame-extraction lane real (the reference
engine has no media path at all; see ``operators/media.py``).

GIF is lossless (indexed), so roundtrips are exact and the catalog row
is oracle-checkable with a value hash, like PNG.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF89 = b"GIF89a"
_GIF87 = b"GIF87a"

# interlace pass (start row, step), GIF spec appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------------ LZW


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first packing, width grows from
    ``min_code_size + 1`` to 12, CLEAR emitted at table-full (4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear, width)
    prefix = b""
    for v in map(int, indices):
        trial = prefix + bytes([v])
        if trial in table:
            prefix = trial
            continue
        put(table[prefix], width)
        if next_code < 4096:
            table[trial] = next_code
            next_code += 1
            # non-early change (unlike TIFF): the decoder widens one
            # code later than it adds, so the encoder widens when
            # next_code passes 1 << width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([v])
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    """Decode a GIF LZW stream to exactly ``expect`` palette indices."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF: LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if not entry:  # a data code naming the CLEAR/EOI slots
                raise ValueError(f"GIF: LZW code {code} is reserved")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # widen AFTER adding, when the table reaches the width
            # ceiling; at 4096 the table freezes until CLEAR (deferred)
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= expect:
            # some writers omit a trailing EOI inside the data; stop at
            # the declared pixel count like every mainstream decoder
            break
    if len(out) < expect:
        raise ValueError(
            f"GIF: LZW data ended at {len(out)} of {expect} pixels"
        )
    return np.frombuffer(bytes(out[:expect]), dtype=np.uint8)


# ------------------------------------------------------------ sub-blocks


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap raw bytes as GIF data sub-blocks (<=255 bytes each + 0x00)."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-block chain")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        out += data[pos:pos + ln]
        if pos + ln > len(data):
            raise ValueError("GIF: truncated sub-block")
        pos += ln
    # unreachable


# --------------------------------------------------------------- encoder


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray,
    delays_cs: list[int] | int = 4,
    loop: int = 0,
    interlace: bool = False,
    transparent_idx: int | None = None,
) -> bytes:
    """Encode index-grid frame(s) + palette as GIF89a.

    ``frames``: one (h, w) uint8 index grid or a list of them (all the
    same shape — full-screen frames; the decoder additionally handles
    partial placements from external files). ``palette``: (n, 3) uint8,
    2 <= n <= 256. ``delays_cs``: per-frame delay in centiseconds (int
    applies to all). ``loop``: Netscape loop count (0 = forever),
    written only for animations. ``transparent_idx`` marks one palette
    slot transparent in every frame's graphic control extension.
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 2 <= len(palette) <= 256:
        raise ValueError("palette must be (n, 3) uint8 with 2 <= n <= 256")
    h, w = frames[0].shape
    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * len(frames)
    if len(delays_cs) != len(frames):
        raise ValueError("one delay per frame required")

    # colour table size: next power of two >= len(palette), min 2
    ct_bits = max(1, int(len(palette) - 1).bit_length())
    ct_size = 1 << ct_bits
    ct = np.zeros((ct_size, 3), np.uint8)
    ct[: len(palette)] = palette

    out = bytearray(_GIF89)
    # logical screen descriptor: global colour table, 8-bit colour res
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | (ct_bits - 1), 0, 0)
    out += ct.tobytes()
    if len(frames) > 1:
        # Netscape application extension (loop count)
        out += b"\x21\xFF\x0BNETSCAPE2.0" + _sub_blocks(
            struct.pack("<BH", 1, loop)
        )
    min_code_size = max(2, ct_bits)
    for frame, delay in zip(frames, delays_cs):
        frame = np.asarray(frame)
        if frame.dtype != np.uint8 or frame.shape != (h, w):
            raise ValueError("all frames must be (h, w) uint8 index grids")
        if int(frame.max(initial=0)) >= len(palette):
            raise ValueError("frame references beyond the palette")
        # graphic control extension
        flags = 0
        tidx = 0
        if transparent_idx is not None:
            flags |= 1
            tidx = transparent_idx
        out += b"\x21\xF9" + struct.pack("<BBHBB", 4, flags, delay, tidx, 0)
        # image descriptor (full screen placement)
        ifl = 0x40 if interlace else 0
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, ifl)
        grid = frame
        if interlace:
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE]
            )
            grid = frame[order]
        out.append(min_code_size)
        out += _sub_blocks(_lzw_encode(grid.reshape(-1), min_code_size))
    out += b"\x3B"  # trailer
    return bytes(out)


# --------------------------------------------------------------- decoder


def decode_gif(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode GIF bytes -> (frames, delays_cs).

    Each frame is the fully composited (screen_h, screen_w, 3) uint8
    RGB logical screen after that image block is drawn — partial-frame
    placement, transparency and disposal methods 0-3 are applied, which
    is what a frame sampler wants. ``delays_cs`` has one centisecond
    delay per frame (0 where the file gave none).
    """
    if data[:6] not in (_GIF87, _GIF89):
        raise ValueError("not a GIF file")
    if len(data) < 13:
        raise ValueError("GIF: truncated header")
    w, h, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    bg_rgb = canvas[0, 0].copy() if h and w else np.zeros(3, np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the next image block
    delay_cs = 0
    transparent: int | None = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF: truncated extension")
            label = data[pos]
            pos += 1
            payload, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                gflags = payload[0]
                (delay_cs,) = struct.unpack_from("<H", payload, 1)
                transparent = payload[3] if gflags & 1 else None
                disposal = (gflags >> 2) & 0x7
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02X}")
        # image descriptor
        left, top, iw, ih, ifl = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if ifl & 0x80:  # local colour table
            n = 2 << (ifl & 0x07)
            ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF: image block with no colour table")
        if left + iw > w or top + ih > h:
            raise ValueError("GIF: image block exceeds the logical screen")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(lzw, min_code_size, iw * ih).reshape(ih, iw)
        if ifl & 0x40:  # interlaced: scatter the four passes back
            seq = np.empty_like(idx)
            order = np.concatenate(
                [np.arange(start, ih, step) for start, step in _INTERLACE]
            )
            seq[order] = idx
            idx = seq
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF: palette index out of range")

        prev_region = canvas[top:top + ih, left:left + iw].copy()
        rgb = ct[idx.astype(np.int64)]
        if transparent is not None:
            keep = idx == transparent
            rgb = np.where(keep[:, :, None], prev_region, rgb)
        canvas[top:top + ih, left:left + iw] = rgb
        frames.append(canvas.copy())
        delays.append(delay_cs)

        if disposal == 2:  # restore to background colour
            canvas[top:top + ih, left:left + iw] = bg_rgb
        elif disposal == 3:  # restore to previous
            canvas[top:top + ih, left:left + iw] = prev_region
        delay_cs = 0
        transparent = None
        disposal = 0

    if not frames:
        raise ValueError("GIF: no image blocks")
    return frames, delays
