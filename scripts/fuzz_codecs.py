#!/usr/bin/env python
"""Deterministic fuzz harness for every byte-level codec in the engine.

For each decoder, three generators of hostile input:
  random   — pure pseudo-random bytes (seeded);
  truncate — a valid file cut at every Nth byte;
  corrupt  — a valid file with one byte overwritten at seeded positions.

Contract under fuzz: the decoder either returns or raises a normal
Python exception QUICKLY — no hang (> DEADLINE s), no giant allocation
(> RLIMIT_AS), no interpreter crash. MemoryError / timeout / segfault
are findings: a corrupt header must be rejected by validation, not by
the allocator.

Runs standalone (python scripts/fuzz_codecs.py [--cases N]) and as the
engine of tests/test_codec_fuzz.py, which executes it in a subprocess
with an address-space cap so a runaway allocation cannot take the test
session down. Exit 0 = contract held for every case; nonzero prints
one line per finding (codec, mode, seed, exception class).
"""

from __future__ import annotations

import os
import signal
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEADLINE = 10  # seconds per case (SIGALRM)
BANNED = (MemoryError,)  # exception classes that count as findings


def _grid_cfg():
    from whitebox_tools_spark.operators.gridding import GridConfig

    return GridConfig(rows=8, cols=9, north=100.0, west=10.0,
                      res_x=1.0, res_y=1.0, nodata=-32768.0)


def _samples() -> dict[str, tuple]:
    """(decoder_callable, valid_bytes) per codec. Valid bytes come from
    the repo's own encoders so the fuzz inputs track the envelope."""
    import pandas as pd

    from whitebox_tools_spark.io import geotiff, las, shapefile, simple_grids
    from whitebox_tools_spark.operators import (avi_codec, gif_codec,
                                                jpeg_codec, media, png_codec)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 17), dtype=np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    cfg = _grid_cfg()
    grid = rng.normal(0, 10, (cfg.rows, cfg.cols)).astype(np.float64)
    pts = pd.DataFrame({
        "x": rng.normal(500, 10, 40), "y": rng.normal(600, 10, 40),
        "z": rng.normal(50, 5, 40),
    })
    from whitebox_tools_spark.io.shapefile import ShapeRecord

    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 0.0]])
    shp, _shx, dbf = shapefile.encode_shapefile(
        [ShapeRecord(parts=[ring], shape_type=5, attrs={"name": "a"})],
        fields=[("name", "C", 8, 0)],
    )
    jpg = jpeg_codec.encode_jpeg(rgb)

    def las_decode(b: bytes):
        return list(las.decode_las(b))

    def shp_decode(b: bytes):
        return shapefile.decode_shapefile(b, dbf)

    def dbf_decode(b: bytes):
        return shapefile.decode_shapefile(shp, b)

    def surfer_ascii(b: bytes):
        return simple_grids.decode_surfer_ascii(b.decode("latin-1"))

    def grass(b: bytes):
        return simple_grids.decode_grass(b.decode("latin-1"))

    # two-part (header text + payload) codecs: fuzz each part against a
    # valid counterpart
    ab_hdr, ab_data = simple_grids.encode_arcbinary(grid, cfg)
    id_hdr, id_data = simple_grids.encode_idrisi(grid, cfg)
    sg_hdr, sg_data = simple_grids.encode_saga(grid, cfg)

    def _two_part(decode_fn, hdr, data, which):
        if which == "data":
            return lambda b: decode_fn(hdr, b), data
        return lambda b: decode_fn(b.decode("latin-1"), data), hdr.encode("latin-1")

    import zipfile
    from io import BytesIO

    las_bytes = las.encode_las(pts)
    zbuf = BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("points.las", las_bytes)

    def las_zip(b: bytes):
        return list(las.decode_las(b))

    gif = gif_codec.encode_gif(
        [np.asarray(img[:8, :8] % 4, dtype=np.uint8)],
        palette=np.asarray(rng.integers(0, 256, (4, 3)), dtype=np.uint8),
    )
    return {
        "png": (png_codec.decode_png, png_codec.encode_png(img)),
        "jpeg": (jpeg_codec.decode_jpeg, jpg),
        "gif": (gif_codec.decode_gif, gif),
        "avi": (avi_codec.decode_avi_mjpeg,
                avi_codec.encode_avi_mjpeg([jpg], 16, 16)),
        "bmp": (media.decode_bmp, media.encode_bmp(rgb)),
        "wav": (media.decode_wav,
                media.encode_wav(
                    (rng.normal(0, 4000, 400)).astype(np.int16), 8000)),
        "geotiff": (geotiff.decode_geotiff, geotiff.encode_geotiff(grid, cfg)),
        "las": (las_decode, las.encode_las(pts)),
        "shp": (shp_decode, shp),
        "dbf": (dbf_decode, dbf),
        "surfer7": (simple_grids.decode_surfer7,
                    simple_grids.encode_surfer7(grid, cfg)),
        "surfer_ascii": (surfer_ascii,
                         simple_grids.encode_surfer_ascii(grid, cfg)
                         .encode("latin-1")),
        "grass": (grass, simple_grids.encode_grass(grid, cfg)
                  .encode("latin-1")),
        "arcbinary_data": _two_part(simple_grids.decode_arcbinary,
                                    ab_hdr, ab_data, "data"),
        "arcbinary_hdr": _two_part(simple_grids.decode_arcbinary,
                                   ab_hdr, ab_data, "hdr"),
        "idrisi_data": _two_part(simple_grids.decode_idrisi,
                                 id_hdr, id_data, "data"),
        "idrisi_hdr": _two_part(simple_grids.decode_idrisi,
                                id_hdr, id_data, "hdr"),
        "saga_data": _two_part(simple_grids.decode_saga,
                               sg_hdr, sg_data, "data"),
        "saga_hdr": _two_part(simple_grids.decode_saga,
                              sg_hdr, sg_data, "hdr"),
        "las_zip": (las_zip, zbuf.getvalue()),
    }


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def _one(decode, data: bytes):
    # outer try catches a _Timeout that lands while the inner block is
    # unwinding (the alarm can fire between decode() raising and
    # alarm(0)); in every such race the decode did run ~DEADLINE, so
    # TIMEOUT is the honest label
    try:
        signal.alarm(DEADLINE)
        try:
            decode(data)
            return None
        finally:
            signal.alarm(0)
    except _Timeout:
        return "TIMEOUT"
    except BANNED as e:
        return f"BANNED:{type(e).__name__}"
    except Exception:  # noqa: BLE001 — a clean reject is the contract
        return None
    except BaseException as e:  # noqa: BLE001
        return f"FATAL:{type(e).__name__}"


def run(cases: int = 60) -> list[str]:
    findings: list[str] = []
    signal.signal(signal.SIGALRM, _alarm)
    for name, (decode, valid) in _samples().items():
        # sanity: the valid sample must decode SUCCESSFULLY — not via
        # _one(), which treats any clean exception as a pass; a decoder
        # that rejects its own valid bytes would otherwise nullify the
        # whole codec's fuzz coverage silently (review-found)
        try:
            signal.alarm(DEADLINE)
            try:
                decode(valid)
            finally:
                signal.alarm(0)
        except BaseException as e:  # noqa: BLE001
            findings.append(
                f"{name} valid-sample rejected: {type(e).__name__}: {e}")
            continue
        rng = np.random.default_rng(1234)
        for i in range(cases):
            blob = rng.integers(0, 256, rng.integers(0, 400),
                                dtype=np.uint8).tobytes()
            err = _one(decode, blob)
            if err:
                findings.append(f"{name} random#{i} {err}")
        n = len(valid)
        for cut in range(0, n, max(1, n // cases)):
            err = _one(decode, valid[:cut])
            if err:
                findings.append(f"{name} truncate@{cut} {err}")
        rng = np.random.default_rng(99)
        for i in range(cases * 2):
            pos = int(rng.integers(0, n))
            val = int(rng.integers(0, 256))
            mut = bytearray(valid)
            mut[pos] = val
            err = _one(decode, bytes(mut))
            if err:
                findings.append(f"{name} corrupt@{pos}={val} {err}")
    return findings


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=60)
    args = ap.parse_args()
    try:
        findings = run(args.cases)
    except Exception:  # harness bug, not a codec finding
        traceback.print_exc()
        return 2
    for f in findings:
        print("FINDING:", f)
    print(f"fuzz: {'FAIL' if findings else 'OK'} ({args.cases} cases/mode)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
