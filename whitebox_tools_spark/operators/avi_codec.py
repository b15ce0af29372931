"""Dependency-free MJPEG-AVI codec (RIFF container + the in-repo JPEG
codec), for the 'real' media decode lane — an actual video container.

Implements the Microsoft AVI RIFF form for Motion-JPEG streams:

- writer: ``RIFF('AVI ')`` with ``LIST hdrl`` (``avih`` MainAVIHeader,
  one ``LIST strl`` with a ``vids/MJPG`` ``strh`` + BITMAPINFOHEADER
  ``strf``), ``LIST movi`` whose ``00dc`` chunks each hold one complete
  baseline-JPEG frame, and an ``idx1`` old-style index — the layout
  every MJPEG consumer (VLC, ffmpeg, OpenCV) accepts;
- reader: a tolerant RIFF walk — frame chunks ``##dc``/``##db`` are
  collected for the first video stream whether they sit directly under
  ``movi`` or inside ``rec `` record LISTs, word-alignment padding is
  honoured, ``idx1`` is ignored (the movi order is authoritative), and
  the frame rate comes from ``strh`` (dwRate/dwScale) with the ``avih``
  microseconds-per-frame as fallback;
- each frame's JPEG payload decodes through
  :mod:`whitebox_tools_spark.operators.jpeg_codec` (baseline AND
  progressive), so the whole video path stays dependency-free.

True inter-coded video (H.264 etc.) still needs ffmpeg and raises at
the documented integration point in ``operators/media.py``. The
reference engine has no media path at all; this lane exists for the
training-data pipeline brief.
"""

from __future__ import annotations

import struct

import numpy as np

from whitebox_tools_spark.operators.jpeg_codec import decode_jpeg


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap complete JPEG byte strings as an MJPEG AVI.

    ``frames``: one JPEG file per frame (e.g. from ``encode_jpeg``),
    all of ``width`` x ``height``. ``fps`` is an integer frame rate.
    """
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,    # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames), 0, 1, max_size,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0, 0, 0, 0,
        1, fps,            # dwScale / dwRate -> fps
        0, len(frames), max_size,
        0xFFFFFFFF,        # dwQuality: default
        0,
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the movi list type
    idx = bytearray()
    off = 4  # past the 'movi' fourcc
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _walk_frames(data: bytes, pos: int, end: int, out: list[bytes],
                 sid: bytes = b"00") -> None:
    """Collect stream ``sid``'s frame chunks between pos..end
    (directly, or nested one level in 'rec ' LISTs)."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + size > len(data):
            raise ValueError("AVI: truncated chunk")
        if cid == b"LIST" and data[body_start:body_start + 4] == b"rec ":
            _walk_frames(data, body_start + 4, body_start + size, out, sid)
        elif cid[2:4] in (b"dc", b"db") and cid[:2] == sid:
            out.append(data[body_start:body_start + size])
        pos = body_start + size + (size & 1)


def decode_avi_mjpeg(data: bytes) -> tuple[list[np.ndarray], float]:
    """Decode MJPEG-AVI bytes -> (frames, fps). Each frame is the JPEG
    decoder's output ((h, w, 1) grayscale or (h, w, 3) RGB uint8)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    pos = 12
    fps = 0.0
    usec_per_frame = 0
    handler = None
    stream_idx = 0           # ordinal of the strh being parsed
    video_stream = None      # ordinal of the first vids stream
    movi_spans: list[tuple[int, int]] = []
    jpegs: list[bytes] = []
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"LIST":
            ltype = data[body:body + 4]
            if ltype == b"movi":
                # defer the walk until strh parsing fixes the video
                # stream's two-digit chunk id (audio-first AVIs put the
                # video on '01', not '00')
                movi_spans.append((body + 4, body + size))
            elif ltype in (b"hdrl", b"strl"):
                pos = body + 4  # descend
                continue
        elif cid == b"avih" and size >= 4:
            (usec_per_frame,) = struct.unpack_from("<I", data, body)
        elif cid == b"strh" and size >= 32:
            fcc_type = data[body:body + 4]
            if fcc_type == b"vids" and handler is None:
                video_stream = stream_idx
                handler = data[body + 4:body + 8]
                if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
                    raise NotImplementedError(
                        f"AVI video codec {handler!r} requires native "
                        "libraries (ffmpeg); only MJPG decodes here"
                    )
                scale, rate = struct.unpack_from("<II", data, body + 20)
                if scale:
                    fps = rate / scale
            stream_idx += 1
        pos = body + size + (size & 1)
    sid = b"%02d" % (video_stream if video_stream is not None else 0)
    for span_start, span_end in movi_spans:
        _walk_frames(data, span_start, span_end, jpegs, sid)
    if not jpegs:
        raise ValueError("AVI: no video frame chunks")
    if fps == 0.0 and usec_per_frame:
        fps = 1_000_000.0 / usec_per_frame
    frames = [decode_jpeg(j) for j in jpegs]
    return frames, fps
