"""Malformed-input hardening for every byte-level codec.

scripts/fuzz_codecs.py is the engine: per codec it feeds seeded random
bytes, truncations of a valid file at every cut point, and single-byte
corruptions, asserting the decoder rejects quickly (normal exception —
no hang, no giant allocation). The harness runs in a SUBPROCESS with an
address-space cap so a runaway allocation can never take the test
session down; plus direct regression tests for the two defects the
first fuzz run found (a corrupt TIFF IFD count building a multi-GB
struct format string; a corrupt .dbf record count looping over billions
of phantom records).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fuzz_harness_all_codecs_reject_cleanly():
    code = (
        "import resource, sys\n"
        # 8 GiB address-space cap: far above legitimate decode needs,
        # far below the corrupt-header allocations the guards reject
        "resource.setrlimit(resource.RLIMIT_AS, (8 << 30, 8 << 30))\n"
        "sys.argv = ['fuzz', '--cases', '25']\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import runpy\n"
        f"runpy.run_path({os.path.join(REPO, 'scripts', 'fuzz_codecs.py')!r},"
        " run_name='__main__')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


class TestFuzzRegressions:
    def test_tiff_corrupt_ifd_count_rejected(self):
        from whitebox_tools_spark.io import geotiff
        from whitebox_tools_spark.operators.gridding import GridConfig

        cfg = GridConfig(rows=8, cols=9, north=100.0, west=10.0,
                         res_x=1.0, res_y=1.0)
        rng = np.random.default_rng(7)
        grid = rng.normal(0, 10, (8, 9))
        data = bytearray(geotiff.encode_geotiff(grid, cfg))
        # the first fuzz run's reproducer: one byte inside an IFD entry
        # count field -> a billions-long RATIONAL unpack
        data[77] = 115
        with pytest.raises(Exception) as ei:
            geotiff.decode_geotiff(bytes(data))
        assert not isinstance(ei.value, MemoryError)

    def test_tiff_entry_count_past_eof_rejected(self):
        import struct

        from whitebox_tools_spark.io import geotiff

        # minimal classic-TIFF header pointing at an IFD that claims
        # 65535 entries in a 16-byte file: the caller's next-IFD read
        # fails fast (struct.error) or the entry-extent guard raises
        # (ValueError) — either way a quick clean reject, never a
        # 65535-entry walk
        blob = b"II*\x00\x08\x00\x00\x00" + b"\xff\xff" + b"\x00" * 6
        with pytest.raises((ValueError, struct.error)):
            geotiff.decode_geotiff(blob)
        # and the in-walk guard itself, on a buffer long enough for the
        # next-IFD pointer but not for the claimed entries
        # 65535 12-byte entries from offset 10 need 786430 bytes
        with pytest.raises(ValueError, match="entries past the end"):
            geotiff._read_ifd_entries(blob + b"\x00" * 786400, 8, "<")

    def test_dbf_corrupt_record_count_rejected(self):
        from whitebox_tools_spark.io import shapefile
        from whitebox_tools_spark.io.shapefile import ShapeRecord

        ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 0.0]])
        shp, _shx, dbf = shapefile.encode_shapefile(
            [ShapeRecord(parts=[ring], shape_type=5, attrs={"name": "a"})],
            fields=[("name", "C", 8, 0)],
        )
        bad = bytearray(dbf)
        bad[7] = 156  # record count high byte -> ~2.6e9 records
        with pytest.raises(ValueError, match="claims .* records"):
            shapefile.decode_shapefile(shp, bytes(bad))

    def test_valid_files_still_decode(self):
        from whitebox_tools_spark.io import geotiff, shapefile
        from whitebox_tools_spark.io.shapefile import ShapeRecord
        from whitebox_tools_spark.operators.gridding import GridConfig

        cfg = GridConfig(rows=8, cols=9, north=100.0, west=10.0,
                         res_x=1.0, res_y=1.0)
        rng = np.random.default_rng(7)
        grid = rng.normal(0, 10, (8, 9))
        cfg2, back = geotiff.decode_geotiff(geotiff.encode_geotiff(grid, cfg))
        assert back.shape == (8, 9)
        ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 0.0]])
        shp, _shx, dbf = shapefile.encode_shapefile(
            [ShapeRecord(parts=[ring], shape_type=5, attrs={"name": "a"})],
            fields=[("name", "C", 8, 0)],
        )
        recs = shapefile.decode_shapefile(shp, dbf)
        assert len(recs) == 1 and recs[0].attrs["name"] == "a"


class TestFuzzRegressions2:
    def _valid_tiff(self):
        from whitebox_tools_spark.io import geotiff
        from whitebox_tools_spark.operators.gridding import GridConfig

        cfg = GridConfig(rows=8, cols=9, north=100.0, west=10.0,
                         res_x=1.0, res_y=1.0)
        rng = np.random.default_rng(7)
        return geotiff, bytearray(geotiff.encode_geotiff(
            rng.normal(0, 10, (8, 9)), cfg))

    def test_tiff_corrupt_image_length_rejected(self):
        geotiff, data = self._valid_tiff()
        data[33] = 62  # ImageLength -> 1,040,187,400 (75 GB decoded)
        with pytest.raises(ValueError, match="claims a"):
            geotiff.decode_geotiff(bytes(data))

    def test_tiff_corrupt_image_width_rejected(self):
        geotiff, data = self._valid_tiff()
        data[21] = 210  # ImageWidth -> 3,523,215,369 (225 GB decoded)
        with pytest.raises(ValueError, match="claims a"):
            geotiff.decode_geotiff(bytes(data))
