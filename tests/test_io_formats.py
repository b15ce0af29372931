"""Round-trip + Spark-path tests for the native format codecs."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_spark.io import ascii_grid, geotiff, las, shapefile
from whitebox_tools_spark.operators.gridding import GridConfig

CFG = GridConfig(rows=37, cols=23, north=1000.0, west=500.0, res_x=10.0, res_y=10.0)


def _demo_grid(dtype="f4", seed=7):
    rng = np.random.default_rng(seed)
    g = rng.normal(100.0, 25.0, size=(CFG.rows, CFG.cols))
    if np.dtype(dtype).kind in "iu":
        g = np.round(g)
    g = g.astype(dtype)
    g[0, 0] = CFG.nodata
    return g


# ------------------------------------------------------------------ geotiff

@pytest.mark.parametrize("dtype", ["f4", "f8", "i2", "u1"])
@pytest.mark.parametrize("compression", [1, 8])
def test_geotiff_roundtrip(dtype, compression):
    g = _demo_grid(dtype)
    data = geotiff.encode_geotiff(g, CFG, compression=compression, rows_per_strip=8)
    cfg2, g2 = geotiff.decode_geotiff(data)
    assert (cfg2.rows, cfg2.cols) == (CFG.rows, CFG.cols)
    assert cfg2.north == CFG.north and cfg2.west == CFG.west
    assert cfg2.res_x == CFG.res_x and cfg2.nodata == CFG.nodata
    np.testing.assert_array_equal(g2, g.astype(np.float64))


def test_geotiff_big_endian():
    g = _demo_grid("f4")
    data = geotiff.encode_geotiff(g, CFG, byteorder=">", compression=1)
    assert data[:2] == b"MM"
    cfg2, g2 = geotiff.decode_geotiff(data)
    np.testing.assert_array_equal(g2, g.astype(np.float64))


def test_geotiff_single_strip():
    g = _demo_grid("f8")
    data = geotiff.encode_geotiff(g, CFG, rows_per_strip=CFG.rows)
    _, g2 = geotiff.decode_geotiff(data)
    np.testing.assert_array_equal(g2, g)


def test_geotiff_rejects_garbage():
    with pytest.raises(ValueError):
        geotiff.decode_geotiff(b"not a tiff at all")


def test_geotiff_spark_read_write(spark, tmp_path):
    g = _demo_grid("f4")
    p = str(tmp_path / "dem.tif")
    with open(p, "wb") as f:
        f.write(geotiff.encode_geotiff(g, CFG))
    df = geotiff.read_geotiff(spark, p, batch_rows=16)
    assert df.count() == CFG.rows * CFG.cols
    got = {(r["row"], r["col"]): r["value"] for r in df.where("row < 2").collect()}
    for c in range(CFG.cols):
        assert got[(0, c)] == pytest.approx(float(g[0, c]))
    # write back from the DataFrame and re-read
    out = str(tmp_path / "out.tif")
    geotiff.write_geotiff(df, CFG, out, dtype="f4")
    cfg3, g3 = geotiff.decode_geotiff(open(out, "rb").read())
    np.testing.assert_array_equal(g3, g.astype(np.float64))


def test_geotiff_tiled_write_mosaics_back(spark, tmp_path):
    g = _demo_grid("f4")
    p = str(tmp_path / "dem.tif")
    with open(p, "wb") as f:
        f.write(geotiff.encode_geotiff(g, CFG))
    df = geotiff.read_geotiff(spark, p)
    files = geotiff.write_geotiff_tiles(df, CFG, str(tmp_path / "tiles"), tile_rows=10)
    assert len(files) == 4  # ceil(37/10)
    rows_seen = 0
    for fp in files:
        bcfg, band = geotiff.decode_geotiff(open(fp, "rb").read())
        r0 = round((CFG.north - bcfg.north) / CFG.res_y)
        np.testing.assert_array_equal(band, g[r0:r0 + bcfg.rows].astype(np.float64))
        rows_seen += bcfg.rows
    assert rows_seen == CFG.rows
    # and the distributed reader over the tile directory sees every cell
    df2 = geotiff.read_geotiff(spark, str(tmp_path / "tiles"))
    assert df2.count() == CFG.rows * CFG.cols


# ------------------------------------------------------------------ las

def _demo_points(n=500, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "x": rng.uniform(500, 900, n).round(3),
        "y": rng.uniform(100, 400, n).round(3),
        "z": rng.uniform(0, 50, n).round(3),
        "intensity": rng.integers(0, 4096, n),
        "return_num": rng.integers(1, 4, n),
        "num_returns": np.full(n, 3),
        "classification": rng.integers(0, 10, n),
        "scan_angle": rng.integers(-15, 15, n),
        "point_source_id": rng.integers(0, 4, n),
        "gps_time": rng.uniform(1e5, 2e5, n),
    })


@pytest.mark.parametrize("fmt", [0, 1])
def test_las_roundtrip(fmt):
    pdf = _demo_points()
    data = las.encode_las(pdf, point_format=fmt)
    (out,) = list(las.decode_las(data))
    # x/y/z quantized at 0.001 like the reference (las.rs:152-154); inputs
    # are already on the grid so equality is exact up to float repr
    np.testing.assert_allclose(out["x"], pdf["x"], atol=5e-4)
    np.testing.assert_allclose(out["y"], pdf["y"], atol=5e-4)
    np.testing.assert_allclose(out["z"], pdf["z"], atol=5e-4)
    np.testing.assert_array_equal(out["intensity"], pdf["intensity"])
    np.testing.assert_array_equal(out["classification"], pdf["classification"])
    np.testing.assert_array_equal(out["return_num"], pdf["return_num"])
    np.testing.assert_array_equal(out["scan_angle"], pdf["scan_angle"])
    if fmt == 1:
        np.testing.assert_array_equal(out["gps_time"], pdf["gps_time"])
    else:
        assert out["gps_time"].isna().all()


def test_las_batched_decode():
    pdf = _demo_points(1000)
    data = las.encode_las(pdf)
    batches = list(las.decode_las(data, batch_points=256))
    assert [len(b) for b in batches] == [256, 256, 256, 232]
    np.testing.assert_allclose(pd.concat(batches)["x"].to_numpy(), pdf["x"], atol=5e-4)


def test_las_rejects_garbage():
    with pytest.raises(ValueError):
        next(las.decode_las(b"NOPE" + b"\0" * 300))


def test_las_spark_read_and_tiles(spark, tmp_path):
    pdf = _demo_points(800)
    p = str(tmp_path / "cloud.las")
    with open(p, "wb") as f:
        f.write(las.encode_las(pdf))
    df = las.read_las(spark, p)
    assert df.count() == 800
    assert df.agg({"intensity": "sum"}).first()[0] == int(pdf["intensity"].sum())
    # tile writer: one .las per quadrant, re-read distributed
    from pyspark.sql import functions as F
    tiled = df.withColumn("tile", (F.col("x") > 700).cast("int") * 2 + (F.col("y") > 250).cast("int"))
    files = las.write_las_tiles(tiled, str(tmp_path / "las_tiles"), "tile")
    assert 1 <= len(files) <= 4
    df2 = las.read_las(spark, str(tmp_path / "las_tiles"))
    assert df2.count() == 800


# ------------------------------------------------------------------ shapefile

def test_shapefile_polygon_roundtrip(tmp_path):
    shell = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], dtype=float)
    hole = np.array([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]], dtype=float)[::-1]
    # shell CW (y-up), hole CCW per spec
    assert not shapefile.ring_is_hole(shell)
    assert shapefile.ring_is_hole(hole)
    recs = [
        shapefile.ShapeRecord(parts=[shell, hole], shape_type=shapefile.SHP_POLYGON,
                              attrs={"NAME": "donut", "AREA": 96.0}),
        shapefile.ShapeRecord(parts=[shell + 20.0], shape_type=shapefile.SHP_POLYGON,
                              attrs={"NAME": "plain", "AREA": 100.0}),
    ]
    base = str(tmp_path / "polys")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read(),
                                     open(base + ".dbf", "rb").read())
    assert len(got) == 2
    np.testing.assert_array_equal(got[0].parts[0], shell)
    np.testing.assert_array_equal(got[0].parts[1], hole)
    assert got[0].attrs["NAME"] == "donut"
    assert got[0].attrs["AREA"] == pytest.approx(96.0)
    feats = shapefile.records_to_features(got)
    assert feats[0].holes == [False, True]


def test_shapefile_points_roundtrip(tmp_path):
    pts = [shapefile.ShapeRecord(parts=[np.array([[float(i), float(2 * i)]])],
                                 shape_type=shapefile.SHP_POINT, attrs={"ID": i})
           for i in range(5)]
    base = str(tmp_path / "pts")
    shapefile.write_shapefile(pts, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read(),
                                     open(base + ".dbf", "rb").read())
    assert [g.attrs["ID"] for g in got] == list(range(5))
    assert got[3].parts[0][0, 1] == 6.0


def test_shapefile_polyline_roundtrip(tmp_path):
    line = np.array([[0, 0], [5, 5], [10, 3]], dtype=float)
    recs = [shapefile.ShapeRecord(parts=[line, line + 1], shape_type=shapefile.SHP_POLYLINE)]
    base = str(tmp_path / "lines")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read())
    assert len(got[0].parts) == 2
    np.testing.assert_array_equal(got[0].parts[1], line + 1)


def test_shapefile_rejects_garbage():
    with pytest.raises(ValueError):
        shapefile.decode_shapefile(b"\0" * 120)


def test_shapefile_spark_read(spark, tmp_path):
    shell = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], dtype=float)
    hole = np.array([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]], dtype=float)[::-1]
    recs = [shapefile.ShapeRecord(parts=[shell, hole], shape_type=shapefile.SHP_POLYGON,
                                  attrs={"NAME": "donut"})]
    base = str(tmp_path / "layer")
    shapefile.write_shapefile(recs, base)
    df = shapefile.read_shapefile(spark, base)
    rows = {(r["fid"], r["part"]): r for r in df.collect()}
    assert rows[(0, 0)]["is_hole"] is False
    assert rows[(0, 1)]["is_hole"] is True
    assert rows[(0, 0)]["NAME"] == "donut"
    assert rows[(0, 1)]["xs"][0] == 2.0  # hole ring starts at its canonical first vertex


# ------------------------------------------------------------------ arcascii

def test_arcascii_roundtrip():
    g = _demo_grid("f8")
    text = ascii_grid.encode_arcascii(g, CFG)
    cfg2, g2 = ascii_grid.decode_arcascii(text)
    assert (cfg2.rows, cfg2.cols, cfg2.north, cfg2.west) == (
        CFG.rows, CFG.cols, CFG.north, CFG.west)
    np.testing.assert_array_equal(g2, g)


def test_arcascii_llcenter_registration():
    text = "ncols 2\nnrows 2\nxllcenter 5.0\nyllcenter 5.0\ncellsize 10.0\nnodata_value -9999\n1 2\n3 4\n"
    cfg, g = ascii_grid.decode_arcascii(text)
    assert cfg.west == 0.0 and cfg.south == 0.0 and cfg.north == 20.0
    np.testing.assert_array_equal(g, [[1, 2], [3, 4]])


def test_arcascii_spark(spark, tmp_path):
    g = _demo_grid("f8")
    p = str(tmp_path / "dem.asc")
    with open(p, "w") as f:
        f.write(ascii_grid.encode_arcascii(g, CFG))
    df = ascii_grid.read_arcascii(spark, p)
    assert df.count() == CFG.rows * CFG.cols
    out = str(tmp_path / "dem2.asc")
    ascii_grid.write_arcascii(df, CFG, out)
    _, g2 = ascii_grid.decode_arcascii(open(out).read())
    np.testing.assert_array_equal(g2, g)


# ------------------------------------------------------------------ cross-format

def test_geotiff_to_arcascii_identity(spark, tmp_path):
    """Same grid through both codecs agrees cell-for-cell."""
    g = _demo_grid("f8")
    tif = str(tmp_path / "a.tif")
    asc = str(tmp_path / "a.asc")
    with open(tif, "wb") as f:
        f.write(geotiff.encode_geotiff(g, CFG))
    with open(asc, "w") as f:
        f.write(ascii_grid.encode_arcascii(g, CFG))
    a = geotiff.read_geotiff(spark, tif).select("row", "col", "value")
    b = ascii_grid.read_arcascii(spark, asc).select("row", "col", "value")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_print_geotiff_tags():
    g = _demo_grid("f4")
    data = geotiff.encode_geotiff(g, CFG)
    tags = geotiff.print_geotiff_tags(data)
    assert tags["ImageWidth"] == (CFG.cols,)
    assert tags["ImageLength"] == (CFG.rows,)
    assert tags["ModelPixelScaleTag"][:2] == (CFG.res_x, CFG.res_y)
    assert float(tags["GDAL_NODATA"][0]) == CFG.nodata


# ------------------------------------------------------------------ whitebox

def test_whitebox_raster_roundtrip():
    from whitebox_tools_spark.io import whitebox_raster as wb
    g = _demo_grid("f8")
    for dtype, atol in (("double", 0), ("float", 1e-4), ("integer", 0.5)):
        src = np.round(g) if dtype == "integer" else g
        header, data = wb.encode_whitebox(src, CFG, data_type=dtype)
        cfg2, g2 = wb.decode_whitebox(header, data)
        assert (cfg2.rows, cfg2.cols) == (CFG.rows, CFG.cols)
        assert cfg2.north == CFG.north and cfg2.west == CFG.west
        assert abs(cfg2.res_x - CFG.res_x) < 1e-9
        if atol:
            np.testing.assert_allclose(g2, src, atol=atol)
        else:
            np.testing.assert_array_equal(g2, src)


def test_whitebox_raster_big_endian():
    from whitebox_tools_spark.io import whitebox_raster as wb
    g = _demo_grid("f8")
    header, data = wb.encode_whitebox(g, CFG, data_type="double", byteorder=">")
    assert "BIG_ENDIAN" in header
    _, g2 = wb.decode_whitebox(header, data)
    np.testing.assert_array_equal(g2, g)


def test_whitebox_raster_spark(spark, tmp_path):
    from whitebox_tools_spark.io import whitebox_raster as wb
    g = _demo_grid("f8")
    tif = str(tmp_path / "a.tif")
    with open(tif, "wb") as f:
        f.write(geotiff.encode_geotiff(g, CFG))
    df = geotiff.read_geotiff(spark, tif)
    base = str(tmp_path / "dem")
    wb.write_whitebox(df, CFG, base)
    back = wb.read_whitebox(spark, base + ".tas")
    assert back.count() == CFG.rows * CFG.cols
    a = df.select("row", "col", "value")
    b = back.select("row", "col", "value")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_convert_raster_format(spark, tmp_path):
    from whitebox_tools_spark.io import convert
    g = _demo_grid("f8")
    tif = str(tmp_path / "a.tif")
    with open(tif, "wb") as f:
        f.write(geotiff.encode_geotiff(g, CFG))
    cfg = convert.convert_raster_format(spark, tif, str(tmp_path / "b.asc"))
    assert (cfg.rows, cfg.cols) == (CFG.rows, CFG.cols)
    convert.convert_raster_format(spark, str(tmp_path / "b.asc"), str(tmp_path / "c.tas"))
    _, df = convert.read_raster(spark, str(tmp_path / "c.tas"))
    a = geotiff.read_geotiff(spark, tif).select("row", "col", "value")
    b = df.select("row", "col", "value")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ----------------------------------------------------------- simple formats

def test_simple_grid_roundtrips():
    from whitebox_tools_spark.io import simple_grids as sg
    g = _demo_grid("f8")
    # GRASS ASCII (lossless repr)
    cfg, g2 = sg.decode_grass(sg.encode_grass(g, CFG))
    assert (cfg.rows, cfg.cols, cfg.north, cfg.west) == (CFG.rows, CFG.cols, CFG.north, CFG.west)
    np.testing.assert_array_equal(g2, g)
    # Surfer ASCII: nodata remaps to 1.71041e38, bottom-to-top storage
    cfg, g2 = sg.decode_surfer_ascii(sg.encode_surfer_ascii(g, CFG))
    assert cfg.nodata == sg.SURFER_NODATA
    assert g2[0, 0] == sg.SURFER_NODATA  # the CFG.nodata cell remapped
    np.testing.assert_array_equal(g2[g != CFG.nodata], g[g != CFG.nodata])
    # Surfer 7 binary
    cfg, g2 = sg.decode_surfer7(sg.encode_surfer7(g, CFG))
    assert (cfg.rows, cfg.cols) == (CFG.rows, CFG.cols)
    assert abs(cfg.north - CFG.north) < 1e-9
    np.testing.assert_array_equal(g2[g != CFG.nodata], g[g != CFG.nodata])
    # ArcBinary f32
    header, data = sg.encode_arcbinary(g, CFG)
    cfg, g2 = sg.decode_arcbinary(header, data)
    np.testing.assert_allclose(g2, g, atol=1e-3)
    # Idrisi real
    header, data = sg.encode_idrisi(g, CFG)
    cfg, g2 = sg.decode_idrisi(header, data)
    assert (cfg.rows, cfg.cols) == (CFG.rows, CFG.cols)
    np.testing.assert_allclose(g2, g, atol=1e-3)
    # SAGA double (lossless), bottom-up .sdat
    header, data = sg.encode_saga(g, CFG, data_format="double")
    cfg, g2 = sg.decode_saga(header, data)
    assert (cfg.rows, cfg.cols) == (CFG.rows, CFG.cols)
    assert abs(cfg.north - CFG.north) < 1e-9
    np.testing.assert_array_equal(g2, g)


def test_simple_grid_rejects_garbage():
    from whitebox_tools_spark.io import simple_grids as sg
    with pytest.raises(ValueError):
        sg.decode_surfer_ascii("not a grid\n1 2\n")
    with pytest.raises(ValueError):
        sg.decode_surfer7(b"\0" * 100)
    with pytest.raises(ValueError):
        sg.decode_idrisi("columns : 4\n", b"")


def test_convert_all_formats_chain(spark, tmp_path):
    """tif -> grd(surfer7) -> flt -> rst -> grass -> asc, values preserved
    to f4 precision through the f4-bound links."""
    from whitebox_tools_spark.io import convert
    g = _demo_grid("f4").astype(np.float64)  # f4-representable values
    tif = str(tmp_path / "a.tif")
    with open(tif, "wb") as f:
        f.write(geotiff.encode_geotiff(g, CFG, compression=1))
    chain = ["b.grd", "c.flt", "d.rst", "e.grass", "g.sgrd", "f.asc"]
    src = tif
    for name in chain:
        dst = str(tmp_path / name)
        convert.convert_raster_format(spark, src, dst)
        src = dst
    cfg, df = convert.read_raster(spark, src)
    assert (cfg.rows, cfg.cols) == (CFG.rows, CFG.cols)
    got = {(r["row"], r["col"]): r["value"] for r in df.collect()}
    mismatch = sum(
        1 for r in range(CFG.rows) for c in range(CFG.cols)
        if g[r, c] != CFG.nodata and abs(got[(r, c)] - g[r, c]) > 1e-3
    )
    assert mismatch == 0


@pytest.mark.parametrize("fmt", [2, 3])
def test_las_rgb_formats(fmt):
    pdf = _demo_points(200)
    rng = np.random.default_rng(5)
    for ch in ("red", "green", "blue"):
        pdf[ch] = rng.integers(0, 65536, len(pdf))
    data = las.encode_las(pdf, point_format=fmt)
    (out,) = list(las.decode_las(data))
    for ch in ("red", "green", "blue"):
        np.testing.assert_array_equal(out[ch], pdf[ch])
    if fmt == 3:
        np.testing.assert_array_equal(out["gps_time"], pdf["gps_time"])
    np.testing.assert_allclose(out["x"], pdf["x"], atol=5e-4)


def test_geotiff_packbits_and_lzw_decode():
    """Reader parity with the reference's NONE/PACKBITS/LZW/DEFLATE set:
    hand-build strips in both compressions and decode."""
    import struct as _struct
    from whitebox_tools_spark.io.geotiff import _unpackbits, _unlzw

    # PackBits: literal + run + literal
    packed = bytes([2, 10, 20, 30]) + bytes([257 - 100, 7]) + bytes([0, 99])
    assert _unpackbits(packed) == bytes([10, 20, 30]) + bytes([7] * 100) + bytes([99])

    # LZW: encode a small byte string with a minimal TIFF-LZW encoder,
    # decode with the reader
    def lzw_encode(data: bytes) -> bytes:
        CLEAR, EOI = 256, 257
        # emit (code, width) pairs with TIFF early-change widths
        pairs = []
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        pairs.append((CLEAR, width))
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                pairs.append((table[w], width))
                table[wc] = next_code
                next_code += 1
                # libtiff/javax timing: widen when next_code hits 2^w
                # (decoder's table lags one entry; see _lzw_compress)
                if next_code == (1 << width) and width < 12:
                    width += 1
                w = bytes([ch])
        if w:
            pairs.append((table[w], width))
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        pairs.append((EOI, width))
        out = bytearray()
        buf = nbits = 0
        for c, wd in pairs:
            buf = (buf << wd) | c
            nbits += wd
            while nbits >= 8:
                out.append((buf >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            out.append((buf << (8 - nbits)) & 0xFF)
        return bytes(out)

    payload = b"TOBEORNOTTOBEORTOBEORNOT" * 20 + bytes(range(256))
    assert _unlzw(lzw_encode(payload)) == payload


def test_shapefile_multipoint_and_z(tmp_path):
    line = np.array([[0, 0], [5, 5], [10, 3]], dtype=float)
    zvals = np.array([1.5, 2.5, 3.5])
    recs = [shapefile.ShapeRecord(parts=[line], shape_type=shapefile.SHP_POLYLINE_Z,
                                  zs=[zvals])]
    base = str(tmp_path / "lz")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read())
    np.testing.assert_array_equal(got[0].parts[0], line)
    np.testing.assert_array_equal(got[0].zs[0], zvals)

    mp = np.array([[1, 2], [3, 4], [5, 6]], dtype=float)
    recs = [shapefile.ShapeRecord(parts=[mp], shape_type=shapefile.SHP_MULTIPOINT)]
    base = str(tmp_path / "mp")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read())
    np.testing.assert_array_equal(got[0].parts[0], mp)

    recs = [shapefile.ShapeRecord(parts=[np.array([[7.0, 8.0]])],
                                  shape_type=shapefile.SHP_POINT_Z,
                                  zs=[np.array([9.0])])]
    base = str(tmp_path / "pz")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read())
    assert got[0].parts[0][0, 0] == 7.0 and got[0].zs[0][0] == 9.0


def test_write_overlay_shapefile(spark, tmp_path):
    """intersect_geom rings -> .shp -> read back: vertex sets + hole
    flags survive, attrs carry the source fids."""
    import __spark_entry__ as m

    df = m.queries()["intersect_geom"](spark, "/root/testdata/sf0.001")
    base = str(tmp_path / "ix")
    n = shapefile.write_overlay_shapefile(df, base)
    assert n >= 1
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read(),
                                     open(base + ".dbf", "rb").read())
    assert len(got) == n
    # every record's shells precede holes and windings encode the flags
    pdf = df.toPandas()
    src_keys = {(a, b) for a, b in zip(pdf["fid_a"], pdf["fid_b"])}
    for rec in got:
        holes = [shapefile.ring_is_hole(p) for p in rec.parts]
        assert holes == sorted(holes)  # shells first
        assert (rec.attrs["FID_A"], rec.attrs["FID_B"]) in src_keys
    # total vertex count preserved (up to ring closure duplicates)
    n_src = sum(len(p) - 1 for rec in got for p in rec.parts)
    assert n_src == len(pdf)


def test_shapefile_prj_sidecar(tmp_path):
    wkt = 'PROJCS["demo",GEOGCS["GCS_WGS_1984"]]'
    recs = [shapefile.ShapeRecord(parts=[np.array([[1.0, 2.0]])],
                                  shape_type=shapefile.SHP_POINT, attrs={"ID": 1})]
    base = str(tmp_path / "p")
    shapefile.write_shapefile(recs, base, prj=wkt)
    assert shapefile.read_projection(base) == wkt
    assert shapefile.read_projection(str(tmp_path / "missing")) is None


def test_geotiff_multiband_roundtrip():
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(CFG.rows, CFG.cols, 3)).astype("u1")
    data = geotiff.encode_geotiff(rgb, CFG, compression=8, rows_per_strip=8)
    tags = geotiff.print_geotiff_tags(data)
    assert tags["SamplesPerPixel"] == (3,)
    assert tags["PhotometricInterpretation"] == (2,)
    cfg2, back = geotiff.decode_geotiff_multi(data)
    assert back.shape == (CFG.rows, CFG.cols, 3)
    np.testing.assert_array_equal(back, rgb.astype(np.float64))
    with pytest.raises(ValueError):
        geotiff.decode_geotiff(data)  # single-band API refuses multiband


# ------------------------------------------------------ LAS 1.3/1.4 formats


@pytest.mark.parametrize("fmt,minor", [(4, 3), (5, 3), (6, 4), (7, 4),
                                       (8, 4), (9, 4), (10, 4)])
def test_las_extended_formats(fmt, minor):
    """Formats 4-10 roundtrip: header version auto-selected, record sizes
    per spec, i16 scan angle + 4-bit returns + u8 class for 6-10."""
    pdf = _demo_points(300)
    rng = np.random.default_rng(7)
    if fmt >= 6:
        pdf["scan_angle"] = rng.integers(-15000, 15000, len(pdf))
        pdf["classification"] = rng.integers(0, 256, len(pdf))
        pdf["return_num"] = rng.integers(1, 16, len(pdf))
        pdf["num_returns"] = np.full(len(pdf), 15)
    if fmt in (5, 7, 8, 10):
        for ch in ("red", "green", "blue"):
            pdf[ch] = rng.integers(0, 65536, len(pdf))
    if fmt in (8, 10):
        pdf["nir"] = rng.integers(0, 65536, len(pdf))
    data = las.encode_las(pdf, point_format=fmt)
    info = las.las_info(data)
    assert info["version"] == (1, minor)
    assert info["point_format"] == fmt
    assert info["record_length"] == {4: 57, 5: 63, 6: 30, 7: 36,
                                     8: 38, 9: 59, 10: 67}[fmt]
    assert info["n_points"] == len(pdf)
    (out,) = list(las.decode_las(data))
    np.testing.assert_allclose(out["x"], pdf["x"], atol=5e-4)
    np.testing.assert_allclose(out["z"], pdf["z"], atol=5e-4)
    np.testing.assert_array_equal(out["scan_angle"], pdf["scan_angle"])
    np.testing.assert_array_equal(out["classification"], pdf["classification"])
    np.testing.assert_array_equal(out["return_num"], pdf["return_num"])
    np.testing.assert_array_equal(out["num_returns"], pdf["num_returns"])
    np.testing.assert_array_equal(out["gps_time"], pdf["gps_time"])
    if fmt in (5, 7, 8, 10):
        for ch in ("red", "green", "blue"):
            np.testing.assert_array_equal(out[ch], pdf[ch])
    if fmt in (8, 10):
        np.testing.assert_array_equal(out["nir"], pdf["nir"])
    else:
        assert (out["nir"] == 0).all()


def test_las_fmt4_to_fmt0_downgrade():
    """fmt 4 (1.3, waveform slots) -> decode -> re-encode fmt 0 (1.2):
    coordinates survive unchanged because re-quantization of already-
    quantized values is stable under the tie-free floor(+0.5) rule."""
    pdf = _demo_points(400)
    d4 = las.encode_las(pdf, point_format=4)
    (mid,) = list(las.decode_las(d4))
    d0 = las.encode_las(mid, point_format=0)
    info = las.las_info(d0)
    assert info["version"] == (1, 2) and info["point_format"] == 0
    (out,) = list(las.decode_las(d0))
    np.testing.assert_array_equal(out["x"], mid["x"])
    np.testing.assert_array_equal(out["y"], mid["y"])
    np.testing.assert_array_equal(out["z"], mid["z"])
    np.testing.assert_array_equal(out["intensity"], mid["intensity"])
    assert out["gps_time"].isna().all()  # fmt 0 drops GPS time


def test_las_wkt_vlr_carrythrough():
    wkt = 'PROJCS["demo",GEOGCS["WGS 84"]]'
    pdf = _demo_points(50)
    data = las.encode_las(pdf, point_format=6, wkt=wkt)
    assert las.las_wkt(data) == wkt
    info = las.las_info(data)
    (vlr,) = info["vlrs"]
    assert vlr["user_id"] == "LASF_Projection"
    assert vlr["record_id"] == las.WKT_CRS_RECORD_ID
    # global-encoding WKT bit set for 1.4 (spec table 3)
    import struct as _s
    assert _s.unpack_from("<H", data, 6)[0] & 16
    # points still decode with the VLR block in between
    (out,) = list(las.decode_las(data))
    assert len(out) == 50
    np.testing.assert_allclose(out["x"], pdf["x"], atol=5e-4)


def test_las_version_format_validation():
    pdf = _demo_points(10)
    with pytest.raises(ValueError, match="requires LAS 1.4"):
        las.encode_las(pdf, point_format=6, version=(1, 2))
    with pytest.raises(ValueError, match="unsupported LAS point format"):
        las.encode_las(pdf, point_format=11)
    with pytest.raises(ValueError, match="unsupported LAS version"):
        las.encode_las(pdf, point_format=0, version=(2, 0))


def test_las_int32_overflow_guard():
    """An axis extent beyond ~2.1e6 units cannot fit i32 at scale 0.001:
    the encoder must raise, not wrap (ADVICE r3)."""
    pdf = pd.DataFrame({"x": [0.0, 3.0e6], "y": [0.0, 1.0], "z": [0.0, 1.0]})
    with pytest.raises(ValueError, match="exceeds int32"):
        las.encode_las(pdf)


# --------------------------------------------------------------- BigTIFF


@pytest.mark.parametrize("bo", ["<", ">"])
def test_bigtiff_roundtrip_bytes(bo):
    """Version-43 encode -> decode, both endians, multi-strip deflate."""
    g = _demo_grid("f8")
    data = geotiff.encode_geotiff(g, CFG, big=True, byteorder=bo,
                                  rows_per_strip=8)
    assert data[2:4] == (b"+\x00" if bo == "<" else b"\x00+")  # version 43
    cfg2, back = geotiff.decode_geotiff(data)
    np.testing.assert_array_equal(back, g.astype(np.float64))
    assert (cfg2.rows, cfg2.cols, cfg2.north, cfg2.west) == (
        CFG.rows, CFG.cols, CFG.north, CFG.west)


def test_bigtiff_matches_classic_values():
    g = _demo_grid("f4")
    _, a = geotiff.decode_geotiff(geotiff.encode_geotiff(g, CFG))
    _, b = geotiff.decode_geotiff(geotiff.encode_geotiff(g, CFG, big=True))
    np.testing.assert_array_equal(a, b)


def test_bigtiff_tag_dump():
    g = _demo_grid("f8")
    tags = geotiff.print_geotiff_tags(
        geotiff.encode_geotiff(g, CFG, big=True, compression=1))
    assert tags["ImageWidth"] == (CFG.cols,)
    assert tags["StripByteCounts"][0] == 23 * 8 * min(64, CFG.rows)


def test_bigtiff_bad_offset_size_rejected():
    g = _demo_grid("f8")
    data = bytearray(geotiff.encode_geotiff(g, CFG, big=True))
    data[4] = 4  # offset size must be 8
    with pytest.raises(ValueError, match="BigTIFF"):
        geotiff.decode_geotiff(bytes(data))


def test_encode_rejects_unwritable_compression():
    """Labeling strips with a compression the writer does not perform
    would corrupt the file (ADVICE r3). PackBits (32773) and JPEG (7)
    became writable in round 5; codes the writer still has no encoder
    for must keep raising."""
    g = _demo_grid("f4")
    for comp in (2, 6, 34712):  # CCITT RLE, old-JPEG, JPEG2000
        with pytest.raises(ValueError, match="compression"):
            geotiff.encode_geotiff(g, CFG, compression=comp)
    # JPEG is writable but only for uint8 imagery — f4 still raises
    with pytest.raises(ValueError, match="uint8"):
        geotiff.encode_geotiff(g, CFG, compression=7)


def test_read_geotiff_bands_spark(spark, tmp_path):
    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, size=(CFG.rows, CFG.cols, 4)).astype(np.uint8)
    p = str(tmp_path / "rgba.tif")
    with open(p, "wb") as f:
        f.write(geotiff.encode_geotiff(rgba, CFG))
    df = geotiff.read_geotiff_bands(spark, p)
    assert df.count() == CFG.rows * CFG.cols * 4
    got = {(r["row"], r["col"], r["band"]): r["value"] for r in df.collect()}
    for r in range(0, CFG.rows, 7):
        for c in range(0, CFG.cols, 5):
            for b in range(4):
                assert got[(r, c, b)] == float(rgba[r, c, b])


# ------------------------------------------------- shapefile DBF edge cases


def test_shapefile_null_shape_attr_alignment(tmp_path):
    """A Null shape (type 0) must consume its .dbf record slot so later
    records keep their own attributes (ADVICE r3 medium; the reference
    keeps Null records in place, shapefile/mod.rs:291)."""
    recs = [
        shapefile.ShapeRecord(parts=[np.array([[1.0, 2.0]])],
                              shape_type=shapefile.SHP_POINT, attrs={"ID": 10}),
        shapefile.ShapeRecord(parts=[], shape_type=0, attrs={"ID": 20}),
        shapefile.ShapeRecord(parts=[np.array([[3.0, 4.0]])],
                              shape_type=shapefile.SHP_POINT, attrs={"ID": 30}),
    ]
    base = str(tmp_path / "withnull")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read(),
                                     open(base + ".dbf", "rb").read())
    assert [r.shape_type for r in got] == [shapefile.SHP_POINT, 0,
                                           shapefile.SHP_POINT]
    assert [r.attrs["ID"] for r in got] == [10, 20, 30]
    assert got[2].parts[0][0, 0] == 3.0  # record 3 kept ITS geometry
    # null shapes carry no geometry into the feature bridge
    feats = shapefile.records_to_features(got)
    assert len(feats) == 2


def test_shapefile_date_and_logical_fields(tmp_path):
    import datetime as dt
    recs = [
        shapefile.ShapeRecord(
            parts=[np.array([[float(i), 0.0]])], shape_type=shapefile.SHP_POINT,
            attrs={"WHEN": dt.date(2021, 3, 5 + i), "OK": i % 2 == 0,
                   "MISSING": None if i == 1 else i * 1.5})
        for i in range(3)
    ]
    base = str(tmp_path / "dl")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read(),
                                     open(base + ".dbf", "rb").read())
    assert [r.attrs["WHEN"] for r in got] == ["20210305", "20210306", "20210307"]
    assert [r.attrs["OK"] for r in got] == [True, False, True]
    # None numeric encodes as the dBase null (spaces) and decodes to None
    assert got[1].attrs["MISSING"] is None
    assert got[0].attrs["MISSING"] == 0.0 * 1.5
    assert got[2].attrs["MISSING"] == 3.0


def test_dbf_numeric_overflow_raises():
    with pytest.raises(ValueError, match="wider than"):
        shapefile._encode_dbf([{"V": 10**30}], [("V", "N", 9, 0)])


def test_dbf_null_logical_roundtrip():
    data = shapefile._encode_dbf([{"B": None}, {"B": True}, {"B": False}],
                                 [("B", "L", 1, 0)])
    out = shapefile._decode_dbf(data)
    assert [r["B"] for r in out] == [None, True, False]


# --------------------------------------------------------------- geokeys

@pytest.mark.parametrize("epsg,key", [(26917, 3072), (4326, 2048)])
def test_geotiff_epsg_carrythrough(epsg, key):
    """CRS EPSG rides the GeoKeyDirectory: projected codes under
    ProjectedCSTypeGeoKey (3072), geographic (EPSG 4xxx block) under
    GeographicTypeGeoKey (2048) — the reference's minimal key set
    (geotiff/mod.rs:2274-2460, find_epsg_code geokeys.rs:120-145)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, epsg=epsg)
    data = geotiff.encode_geotiff(_demo_grid(), cfg, rows_per_strip=8)
    tags = geotiff.print_geotiff_tags(data)
    d = tags["GeoKeyDirectoryTag"]
    assert d[:4] == (1, 1, 0, 3)
    entries = {d[4 + 4 * k]: d[4 + 4 * k + 3] for k in range(d[3])}
    assert entries[key] == epsg
    assert entries[1024] == (2 if key == 2048 else 1)
    assert entries[1025] == 1  # PixelIsArea
    cfg2, _ = geotiff.decode_geotiff(data)
    assert cfg2.epsg == epsg


@pytest.mark.parametrize("big", [False, True])
def test_geotiff_epsg_bigtiff_and_default(big):
    import dataclasses
    cfg = dataclasses.replace(CFG, epsg=32633)
    data = geotiff.encode_geotiff(_demo_grid(), cfg, big=big)
    assert geotiff.decode_geotiff(data)[0].epsg == 32633
    # no epsg -> no GeoKeyDirectory tag, decode reports 0 (unknown)
    plain = geotiff.encode_geotiff(_demo_grid(), CFG, big=big)
    assert "GeoKeyDirectoryTag" not in geotiff.print_geotiff_tags(plain)
    assert geotiff.decode_geotiff(plain)[0].epsg == 0


def test_write_geotiff_cell_guard(spark, tmp_path):
    import dataclasses
    from whitebox_tools_spark.io.geotiff import write_geotiff
    big_cfg = dataclasses.replace(CFG, rows=1 << 15, cols=1 << 15)
    df = spark.createDataFrame([(0, 0, 1.0)], "row long, col long, value double")
    with pytest.raises(ValueError, match="write_geotiff_tiles"):
        write_geotiff(df, big_cfg, str(tmp_path / "x.tif"))


# ------------------------------------------------- predictor 2 / tiled layout


@pytest.mark.parametrize("dtype", ["u1", "u2", "i2", "i4"])
@pytest.mark.parametrize("compression", [1, 8])
def test_geotiff_predictor2_roundtrip(dtype, compression):
    """Horizontal differencing survives encode->decode, including values
    whose per-row difference wraps the sample dtype (modular arithmetic,
    TIFF 6.0 §14). The reference un-diffs on read (geotiff/mod.rs:1526)."""
    rng = np.random.default_rng(11)
    info = np.iinfo(dtype)
    g = rng.integers(info.min, info.max, size=(CFG.rows, CFG.cols),
                     endpoint=True).astype(dtype)
    data = geotiff.encode_geotiff(g, CFG, compression=compression,
                                  rows_per_strip=8, predictor=2)
    assert geotiff.print_geotiff_tags(data)["Predictor"] == (2,)
    _, g2 = geotiff.decode_geotiff(data)
    np.testing.assert_array_equal(g2, g.astype(np.float64))


def test_geotiff_predictor2_multiband_and_bigtiff():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 255, size=(19, 13, 3), endpoint=True).astype("u1")
    for big in (False, True):
        data = geotiff.encode_geotiff(g, CFG, big=big, predictor=2,
                                      rows_per_strip=4)
        _, back = geotiff.decode_geotiff_multi(data)
        np.testing.assert_array_equal(back, g.astype(np.float64))


def test_geotiff_predictor2_shrinks_deflate():
    """The point of predictor 2: a smooth ramp deflates far smaller."""
    ramp = (np.arange(64)[:, None] * 7 + np.arange(256)[None, :] * 3).astype("u2")
    cfg = GridConfig(rows=64, cols=256, north=0, west=0, res_x=1, res_y=1)
    plain = geotiff.encode_geotiff(ramp, cfg, compression=8)
    pred = geotiff.encode_geotiff(ramp, cfg, compression=8, predictor=2)
    assert len(pred) < 0.7 * len(plain)


def test_geotiff_predictor2_rejects_float():
    with pytest.raises(ValueError, match="integer"):
        geotiff.encode_geotiff(_demo_grid("f4"), CFG, predictor=2)
    with pytest.raises(ValueError, match="predictor"):
        geotiff.encode_geotiff(_demo_grid("i2").astype("i2"), CFG, predictor=3)


def _build_tiled_tiff(arr, tw, th, predictor=1):
    """Hand-build a minimal little-endian classic TIFF with TILE layout
    (tags 322-325) — the layout external writers (GDAL) produce; our
    encoder emits strips, so this fixture exercises the tile read path."""
    import math
    import struct

    h, w = arr.shape
    dt = np.dtype("<u2")
    a = arr.astype(dt)
    across, down = math.ceil(w / tw), math.ceil(h / th)
    tiles = []
    for ti in range(down):
        for tj in range(across):
            pad = np.zeros((th, tw), dt)  # edge tiles are padded (spec)
            blk = a[ti * th:(ti + 1) * th, tj * tw:(tj + 1) * tw]
            pad[: blk.shape[0], : blk.shape[1]] = blk
            if predictor == 2:
                d = pad.copy()
                d[:, 1:] = pad[:, 1:] - pad[:, :-1]
                pad = d
            tiles.append(pad.tobytes())
    n_tiles = len(tiles)

    tags = [
        (256, 4, 1, struct.pack("<I", w)), (257, 4, 1, struct.pack("<I", h)),
        (258, 3, 1, struct.pack("<H", 16)), (259, 3, 1, struct.pack("<H", 1)),
        (277, 3, 1, struct.pack("<H", 1)), (317, 3, 1, struct.pack("<H", predictor)),
        (322, 4, 1, struct.pack("<I", tw)), (323, 4, 1, struct.pack("<I", th)),
        (324, 4, n_tiles, None), (325, 4, n_tiles, None),
        (339, 3, 1, struct.pack("<H", 1)),
    ]
    n = len(tags)
    ifd_size = 2 + 12 * n + 4
    extra_off = 8 + ifd_size
    offsets_pos, counts_pos = extra_off, extra_off + 4 * n_tiles
    data_off = extra_off + 8 * n_tiles
    tile_offsets, p = [], data_off
    for t in tiles:
        tile_offsets.append(p)
        p += len(t)

    out = bytearray(b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", n))
    for tag, ftype, count, val in tags:
        out += struct.pack("<HHI", tag, ftype, count)
        if tag == 324:
            out += struct.pack("<I", tile_offsets[0] if n_tiles == 1 else offsets_pos)
        elif tag == 325:
            out += struct.pack("<I", len(tiles[0]) if n_tiles == 1 else counts_pos)
        else:
            out += val + b"\0" * (4 - len(val))
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<%dI" % n_tiles, *tile_offsets)
    out += struct.pack("<%dI" % n_tiles, *(len(t) for t in tiles))
    for t in tiles:
        out += t
    return bytes(out)


@pytest.mark.parametrize("predictor", [1, 2])
def test_geotiff_tiled_layout_decode(predictor):
    """Tile-organized files (GDAL's default for big rasters) decode
    correctly, including padded edge tiles and per-tile-row predictor."""
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 65535, size=(21, 17), endpoint=True).astype("u2")
    data = _build_tiled_tiff(arr, tw=8, th=6, predictor=predictor)
    _, back = geotiff.decode_geotiff(data)
    np.testing.assert_array_equal(back, arr.astype(np.float64))


# ------------------------------------------------ M shape types / optional M


def test_shapefile_m_types_roundtrip(tmp_path):
    """PointM/PolyLineM/PolygonM/MultiPointM (types 21/23/25/28,
    geometry.rs:488-491): measures survive the byte roundtrip."""
    line = np.array([[0, 0], [5, 5], [10, 3]], dtype=float)
    mvals = np.array([0.25, 0.5, 0.75])

    for stype, parts, ms in [
        (shapefile.SHP_POINT_M, [np.array([[7.0, 8.0]])], [np.array([42.0])]),
        (shapefile.SHP_POLYLINE_M, [line], [mvals]),
        (shapefile.SHP_MULTIPOINT_M, [line.copy()], [mvals]),
    ]:
        recs = [shapefile.ShapeRecord(parts=parts, shape_type=stype, ms=ms)]
        base = str(tmp_path / f"m{stype}")
        shapefile.write_shapefile(recs, base)
        got = shapefile.decode_shapefile(open(base + ".shp", "rb").read())
        assert got[0].shape_type == stype
        np.testing.assert_array_equal(got[0].parts[0], parts[0])
        np.testing.assert_array_equal(got[0].ms[0], ms[0])

    # PolygonM: closed CW ring, measure per vertex, hole flag machinery
    ring = np.array([[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]], dtype=float)
    recs = [shapefile.ShapeRecord(parts=[ring], shape_type=shapefile.SHP_POLYGON_M,
                                  ms=[np.arange(5.0)])]
    base = str(tmp_path / "pgm")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read())
    np.testing.assert_array_equal(got[0].ms[0], np.arange(5.0))


def test_shapefile_multipoint_z_roundtrip(tmp_path):
    pts = np.array([[1, 2], [3, 4], [5, 6]], dtype=float)
    zs, ms = np.array([9.0, 8.0, 7.0]), np.array([0.1, 0.2, 0.3])
    recs = [shapefile.ShapeRecord(parts=[pts], shape_type=shapefile.SHP_MULTIPOINT_Z,
                                  zs=[zs], ms=[ms])]
    base = str(tmp_path / "mpz")
    shapefile.write_shapefile(recs, base)
    got = shapefile.decode_shapefile(open(base + ".shp", "rb").read())
    np.testing.assert_array_equal(got[0].parts[0], pts)
    np.testing.assert_array_equal(got[0].zs[0], zs)
    np.testing.assert_array_equal(got[0].ms[0], ms)


def test_shapefile_z_without_m_block_decodes():
    """The reference omits the M block from *Z records when the geometry
    has no m data (geometry.rs:248-270); the decoder must not read past
    the record. Hand-build a PointZ (24-byte content) and a PolyLineZ
    with z but no m."""
    import struct

    # PointZ, no m: type + x + y + z = 28 bytes = 14 words
    body = struct.pack("<i3d", shapefile.SHP_POINT_Z, 1.0, 2.0, 3.0)
    rec = struct.pack(">2i", 1, len(body) // 2) + body
    hdr = shapefile._shp_header(shapefile.SHP_POINT_Z, (1, 2, 1, 2),
                                (100 + len(rec)) // 2)
    got = shapefile.decode_shapefile(hdr + rec)
    assert got[0].zs[0][0] == 3.0 and got[0].ms is None

    # PolyLineZ, one 2-point part, z range+values, NO m block
    pts = np.array([[0.0, 0.0], [1.0, 1.0]])
    zf = np.array([5.0, 6.0])
    body = struct.pack("<i4d2i", shapefile.SHP_POLYLINE_Z, 0, 0, 1, 1, 1, 2)
    body += struct.pack("<i", 0) + pts.astype("<f8").tobytes()
    body += struct.pack("<2d", 5.0, 6.0) + zf.astype("<f8").tobytes()
    rec = struct.pack(">2i", 1, len(body) // 2) + body
    hdr = shapefile._shp_header(shapefile.SHP_POLYLINE_Z, (0, 0, 1, 1),
                                (100 + len(rec)) // 2)
    got = shapefile.decode_shapefile(hdr + rec)
    np.testing.assert_array_equal(got[0].zs[0], zf)
    assert got[0].ms is None


def test_shapefile_rejects_multipatch():
    rec = shapefile.ShapeRecord(parts=[np.array([[0.0, 0.0]])], shape_type=31)
    with pytest.raises(ValueError, match="unsupported shape type"):
        shapefile.encode_shapefile([rec])


# ------------------------------------------------------------- paletted TIFF


def test_geotiff_paletted_roundtrip():
    """Paletted (photometric 3) decode: palette[index] ARGB-packed as
    f64, the reference's Categorical convention (geotiff/mod.rs:761-787,
    :1289-1297), including the truncating 16->8-bit channel rescale."""
    rng = np.random.default_rng(31)
    idx = rng.integers(0, 5, size=(CFG.rows, CFG.cols)).astype("u1")
    pal = rng.integers(0, 65535, size=(5, 3), endpoint=True).astype("u2")
    data = geotiff.encode_geotiff(idx, CFG, palette=pal)
    tags = geotiff.print_geotiff_tags(data)
    assert tags["PhotometricInterpretation"] == (3,)
    assert len(tags["ColorMap"]) == 15
    _, arr = geotiff.decode_geotiff(data)
    r = (pal[:, 0] / 65535.0 * 255.0).astype(np.uint32)
    g = (pal[:, 1] / 65535.0 * 255.0).astype(np.uint32)
    b = (pal[:, 2] / 65535.0 * 255.0).astype(np.uint32)
    lut = ((np.uint32(255) << 24) | (r << 16) | (g << 8) | b).astype(np.float64)
    np.testing.assert_array_equal(arr, lut[idx.astype(np.int64)])


def test_geotiff_paletted_validation():
    idx = np.zeros((4, 4), dtype="u1")
    with pytest.raises(ValueError, match="palette"):
        geotiff.encode_geotiff(idx, CFG, palette=np.zeros((300, 3), "u2"))
    with pytest.raises(ValueError, match="index grid"):
        geotiff.encode_geotiff(idx + 9, CFG, palette=np.zeros((5, 3), "u2"))
    with pytest.raises(ValueError, match="uint8"):
        geotiff.encode_geotiff(idx.astype("u2"), CFG, palette=np.zeros((5, 3), "u2"))
    # paletted file without a ColorMap tag must be rejected like the
    # reference ("Colour map not present in Paletted TIFF.")
    good = geotiff.encode_geotiff(idx, CFG, palette=np.zeros((5, 3), "u2"))
    import struct as _s
    bad = bytearray(good)
    # flip the photometric tag value on a NON-paletted file instead:
    plain = bytearray(geotiff.encode_geotiff(np.zeros((4, 4), "u1"), CFG))
    n, = _s.unpack_from("<H", plain, 8)
    for e in range(n):
        off = 10 + 12 * e
        tag, = _s.unpack_from("<H", plain, off)
        if tag == 262:
            _s.pack_into("<H", plain, off + 8, 3)
    with pytest.raises(ValueError, match="Colour map"):
        geotiff.decode_geotiff(bytes(plain))


def test_geokey_geographic_classification():
    """Projected codes inside the 4xxx block (4087/4088) and common
    geographic codes outside it (6318/7844) classify correctly; the
    explicit epsg_geographic flag overrides the inference."""
    import dataclasses
    from whitebox_tools_spark.io.geotiff import _geokey_directory_values

    def model_and_key(vals):
        # header is 4 shorts, then (key, loc, cnt, value) quadruples
        quads = [tuple(vals[i:i + 4]) for i in range(4, len(vals), 4)]
        d = {q[0]: q[3] for q in quads}
        return d[1024], (2048 in d, 3072 in d)

    assert model_and_key(_geokey_directory_values(4326)) == (2, (True, False))
    assert model_and_key(_geokey_directory_values(26917)) == (1, (False, True))
    # projected despite living in 4xxx (ADVICE r4 #2: the known
    # projected outliers beyond 4087/4088 classify as projected too)
    for code in (4087, 4088, 4414, 4415, 4417, 4434, 4455, 4456, 4457,
                 4484, 4497,
                 # round-5 widening: MOLDREF99 TM, WGS84 TMzn, DKTM,
                 # Kertau grids, CGCS2000 / New Beijing Gauss-Kruger
                 4026, 4037, 4038, 4093, 4096, 4390, 4398, 4491, 4554,
                 4568, 4589):
        assert model_and_key(_geokey_directory_values(code)) == (
            1, (False, True)), code
    # geographic despite living outside 4xxx
    assert model_and_key(_geokey_directory_values(6318)) == (2, (True, False))
    assert model_and_key(_geokey_directory_values(7844)) == (2, (True, False))
    # explicit override wins
    assert model_and_key(_geokey_directory_values(9999, geographic=True)) == (
        2, (True, False))
    # end-to-end: flag rides GridConfig
    cfg = dataclasses.replace(CFG, epsg=4087)
    data = geotiff.encode_geotiff(_demo_grid(), cfg)
    tags = geotiff.print_geotiff_tags(data)
    assert model_and_key(tags["GeoKeyDirectoryTag"]) == (1, (False, True))
    assert geotiff.decode_geotiff(data)[0].epsg == 4087


def test_las_attribute_overflow_raises():
    """Attribute values beyond their spec field raise instead of
    silently wrapping (same policy as the i32 coordinate guard)."""
    base = dict(x=[1.0], y=[2.0], z=[3.0])
    with pytest.raises(ValueError, match="scan_angle"):
        las.encode_las(pd.DataFrame({**base, "scan_angle": [40000]}),
                       point_format=6)
    with pytest.raises(ValueError, match="scan_angle"):
        las.encode_las(pd.DataFrame({**base, "scan_angle": [200]}),
                       point_format=1)
    with pytest.raises(ValueError, match="intensity"):
        las.encode_las(pd.DataFrame({**base, "intensity": [70000]}),
                       point_format=1)
    with pytest.raises(ValueError, match="classification"):
        las.encode_las(pd.DataFrame({**base, "classification": [300]}),
                       point_format=1)
    # in-range values still encode
    ok = las.encode_las(pd.DataFrame({**base, "scan_angle": [200]}),
                        point_format=6)
    assert ok[:4] == b"LASF"


# --------------------------------------------- round-4 self-review fixes


def test_dbf_deleted_record_keeps_alignment():
    """A soft-deleted .dbf row keeps its slot so later features' attrs
    don't shift by one."""
    recs = [{"Z": i} for i in range(3)]
    dbf = bytearray(shapefile._encode_dbf(recs, [("Z", "N", 9, 0)]))
    hdr_size = 32 + 32 + 1
    dbf[hdr_size + 10] = ord("*")  # delete record 1 (rec_size = 10)
    got = shapefile._decode_dbf(bytes(dbf))
    assert len(got) == 3
    assert got[0]["Z"] == 0 and got[1] == {} and got[2]["Z"] == 2


def test_dbf_logical_date_length_validation():
    with pytest.raises(ValueError, match="length must be 1"):
        shapefile._encode_dbf([{"F": True}], [("F", "L", 2, 0)])
    with pytest.raises(ValueError, match="length must be 8"):
        shapefile._encode_dbf([{"D": "20200101"}], [("D", "D", 10, 0)])


def test_shapefile_zm_payload_length_validation(tmp_path):
    line = np.array([[0, 0], [5, 5], [10, 3]], dtype=float)
    rec = shapefile.ShapeRecord(parts=[line], shape_type=shapefile.SHP_POLYLINE_Z,
                                zs=[np.array([1.0, 2.0])])  # 2 z for 3 pts
    with pytest.raises(ValueError, match="z payload"):
        shapefile.encode_shapefile([rec])


def test_geotiff_strip_offsets_word_aligned():
    """TIFF 6.0 requires values (and by convention strip data) to begin
    on word boundaries; the odd-length GDAL_NODATA ASCII must not make
    offsets odd."""
    g = _demo_grid("f8")
    for big in (False, True):
        data = geotiff.encode_geotiff(g, CFG, big=big, compression=1)
        tags = geotiff.print_geotiff_tags(data)
        assert all(o % 2 == 0 for o in tags["StripOffsets"])


def test_nan_nodata_drop(spark, tmp_path):
    """drop_nodata must drop NaN nodata cells (NaN != NaN is always
    True, so the naive filter keeps them all)."""
    import dataclasses
    arr = np.array([[1.0, np.nan], [3.0, np.nan]])
    cfg = dataclasses.replace(CFG, rows=2, cols=2, nodata=float("nan"))
    p = str(tmp_path / "nan.tif")
    with open(p, "wb") as f:
        f.write(geotiff.encode_geotiff(arr, cfg))
    got = geotiff.read_geotiff(spark, p, drop_nodata=True).toPandas()
    assert sorted(got["value"]) == [1.0, 3.0]


def test_write_geotiff_tiles_carries_epsg_and_fills_empty_bands(spark, tmp_path):
    """Every band tile carries the CRS, and an all-nodata band still
    produces a (nodata) file so the mosaic has no silent hole."""
    import dataclasses
    cfg = dataclasses.replace(CFG, rows=30, cols=4, epsg=26917)
    # data only in rows 0-9 and 20-29: band 1 (rows 10-19) is empty
    rows = [(r, c, float(r * 10 + c)) for r in list(range(10)) + list(range(20, 30))
            for c in range(4)]
    df = spark.createDataFrame(rows, "row long, col long, value double")
    files = geotiff.write_geotiff_tiles(df, cfg, str(tmp_path / "t"), tile_rows=10)
    assert len(files) == 3  # including the empty middle band
    for fp in files:
        c = geotiff.read_geotiff_config(fp)
        assert c.epsg == 26917
    with open(files[1], "rb") as f:
        _, band1 = geotiff.decode_geotiff(f.read())
    assert (band1 == cfg.nodata).all()  # all-nodata, not missing
    # mosaic back: data rows identical
    back = geotiff.read_geotiff(spark, str(tmp_path / "t"), drop_nodata=True)
    assert back.count() == len(rows)


def test_las_tiles_carry_wkt(spark, tmp_path):
    pdf_rows = [(float(i), float(i * 2), 5.0, i % 4) for i in range(40)]
    df = spark.createDataFrame(pdf_rows, "x double, y double, z double, tile int")
    files = las.write_las_tiles(df, str(tmp_path / "lt"), "tile",
                                point_format=6, wkt="PROJCS[\"test\"]")
    for fp in files:
        with open(fp, "rb") as f:
            assert las.las_wkt(f.read()) == "PROJCS[\"test\"]"


@pytest.mark.parametrize("dtype", ["u1", "u2", "f8"])
def test_geotiff_lzw_encode_roundtrip(dtype):
    """Writer-side TIFF-LZW (compression 5) roundtrips through the
    reader, including strips large enough to force the 12-bit table
    reset (CLEAR re-emission at next_code 4094)."""
    rng = np.random.default_rng(41)
    big = GridConfig(rows=64, cols=512, north=0, west=0, res_x=1, res_y=1)
    if dtype == "f8":
        g = rng.normal(0, 1000, size=(big.rows, big.cols)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        g = rng.integers(info.min, info.max, size=(big.rows, big.cols),
                         endpoint=True).astype(dtype)
    data = geotiff.encode_geotiff(g, big, compression=5, rows_per_strip=32)
    assert geotiff.print_geotiff_tags(data)["Compression"] == (5,)
    _, back = geotiff.decode_geotiff(data)
    np.testing.assert_array_equal(back, g.astype(np.float64))


def test_geotiff_lzw_with_predictor():
    ramp = (np.arange(32)[:, None] * 3 + np.arange(128)[None, :]).astype("u2")
    cfg = GridConfig(rows=32, cols=128, north=0, west=0, res_x=1, res_y=1)
    data = geotiff.encode_geotiff(ramp, cfg, compression=5, predictor=2)
    _, back = geotiff.decode_geotiff(data)
    np.testing.assert_array_equal(back, ramp.astype(np.float64))
    plain = geotiff.encode_geotiff(ramp, cfg, compression=5)
    assert len(data) < len(plain)  # predictor helps LZW too


def test_geotiff_lzw_eoi_width_at_early_change_boundary():
    """When the final data code lands exactly on the early-change
    boundary (next_code == 2^width - 2 at loop end), the decoder adds
    one table entry after that code and widens BEFORE reading EOI; the
    encoder must emit EOI at the widened width or strict EOI-honoring
    decoders misread it and append trailing garbage (ADVICE r4 #1).
    The payload below is a pinned low-entropy case that hits the
    boundary; pre-fix it decoded to len(payload)+2 bytes."""
    import base64 as _b64
    import zlib as _zlib
    from whitebox_tools_spark.io.geotiff import _lzw_compress, _unlzw

    payload = _zlib.decompress(_b64.b64decode(
        "eJwdkgkOxDAMAm0M//9yhkhV0/XF4GwUr+dyXsma1WY3Pg6PpZnJ2ATPl1C0vEaT"
        "kJgTkWhFjmY+dcPIa9uFwNxd2zykGL05EutFym6pcwwkFEi09CexmNFPatFEEJhF"
        "Dqzl59IC03zdOmBeoG35IBvVFFrQgFAvNEINDf4ggygfWMinJbPHOqgjAkidDVgW"
        "XeK5dfGw9hk5ECYrLP5xRxltcC2zkGdXUxt0fwrKmnHBMAEV2Qq1F9P1VYOA1UPH"
        "45xRpP/uKosIWHTXckdTvFD1kjCDBYpYEnFoepvqPdpXdk7skmEX7RZ/Ae6bMDLU"
        "/kVdN63OgLV3qX0D+wV/"))
    assert _unlzw(_lzw_compress(payload)) == payload
    # sweep the neighbourhood so the boundary stays covered if the
    # pinned payload's table trajectory ever shifts
    for cut in range(520, 556):
        p = payload[:cut]
        assert _unlzw(_lzw_compress(p)) == p


def test_paletted_signed_sampleformat_rejected():
    """A pathological signed-SampleFormat paletted TIFF whose pixels go
    negative passes the idx.max() palette-length guard, but numpy
    negative indexing would silently map lut[-n] to the palette tail;
    the decoder must reject it instead (ADVICE r4 #3)."""
    import dataclasses
    import struct

    pal = np.tile((np.arange(256)[:, None] * 257), (1, 3)).astype(np.uint16)
    idx = np.array([[0, 1], [2, 255]], dtype=np.uint8)  # 255 -> -1 signed
    cfg = dataclasses.replace(CFG, rows=2, cols=2)
    data = bytearray(geotiff.encode_geotiff(idx, cfg, palette=pal))
    # classic little-endian TIFF: walk the IFD and flip SampleFormat
    # (339) from 1 (unsigned) to 2 (signed)
    ifd = struct.unpack_from("<I", data, 4)[0]
    n = struct.unpack_from("<H", data, ifd)[0]
    flipped = False
    for k in range(n):
        off = ifd + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", data, off)
        if tag == 339:
            struct.pack_into("<H", data, off + 8, 2)
            flipped = True
    assert flipped
    with pytest.raises(ValueError, match="negative"):
        geotiff.decode_geotiff(bytes(data))


def test_single_file_writer_guards(spark, tmp_path):
    """Every single-file writer that assembles driver-side fails with a
    clear max_cells/max_points error instead of an OOM (VERDICT r4
    'What's wrong' #1/#4)."""
    import dataclasses

    from whitebox_tools_spark.io import ascii_grid, convert, las, whitebox_raster

    tiny = spark.createDataFrame([(0, 0, 1.0)], "row long, col long, value double")
    big_cfg = dataclasses.replace(CFG, rows=2, cols=2)
    with pytest.raises(ValueError, match="max_cells"):
        ascii_grid.write_arcascii(tiny, big_cfg, str(tmp_path / "a.asc"), max_cells=2)
    with pytest.raises(ValueError, match="max_cells"):
        whitebox_raster.write_whitebox(tiny, big_cfg, str(tmp_path / "w"), max_cells=2)
    with pytest.raises(ValueError, match="max_cells"):
        convert._grid_np(tiny, big_cfg, max_cells=2)
    pts = spark.createDataFrame(
        [(float(i), float(i), 1.0) for i in range(5)], "x double, y double, z double")
    with pytest.raises(ValueError, match="max_points"):
        las.write_las(pts, str(tmp_path / "p.las"), max_points=3)
    # under the caps the writers still work
    ascii_grid.write_arcascii(tiny, big_cfg, str(tmp_path / "ok.asc"))
    las.write_las(pts, str(tmp_path / "ok.las"))
    assert (tmp_path / "ok.asc").exists() and (tmp_path / "ok.las").exists()


def test_las_zip_container_roundtrip(spark, tmp_path):
    """.las.zip container parity (reference las.rs:486-547 read via
    ZipArchive entry 0, :1163-1180 ZipWriter/deflate write): write_las
    to a .zip path emits a real zip whose inner entry follows the
    reference naming rule; decode_las/read_las unwrap by magic sniff."""
    import zipfile

    pts = spark.createDataFrame(
        [(float(i), float(i * 2), float(i) / 4, float(i), i % 7)
         for i in range(50)],
        "x double, y double, z double, gps_time double, intensity int")
    # name.las.zip -> inner entry 'name.las' (stem already carries .las)
    p1 = str(tmp_path / "cloud.las.zip")
    las.write_las(pts, p1, point_format=1)
    with zipfile.ZipFile(p1) as z:
        assert z.namelist() == ["cloud.las"]
        assert z.infolist()[0].compress_type == zipfile.ZIP_DEFLATED
    # name.zip -> inner entry 'name.las' (reference appends .las)
    p2 = str(tmp_path / "cloud2.zip")
    las.write_las(pts, p2, point_format=1)
    with zipfile.ZipFile(p2) as z:
        assert z.namelist() == ["cloud2.las"]
    # distributed re-read of the zip equals the bare-las read
    p3 = str(tmp_path / "cloud.las")
    las.write_las(pts, p3, point_format=1)
    a = las.read_las(spark, p1).select("x", "y", "z", "gps_time").orderBy("gps_time").collect()
    b = las.read_las(spark, p3).select("x", "y", "z", "gps_time").orderBy("gps_time").collect()
    assert a == b
    # las_info / las_wkt accept zip bytes too
    with open(p1, "rb") as f:
        zbytes = f.read()
    assert las.las_info(zbytes)["n_points"] == 50
    # malformed containers raise the reference's errors
    bad = tmp_path / "bad.las.zip"
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("not_las.txt", b"hello")
    with pytest.raises(ValueError, match="las' extension"):
        list(las.decode_las(bad.read_bytes()))
    empty = tmp_path / "empty.las.zip"
    with zipfile.ZipFile(empty, "w"):
        pass
    with pytest.raises(ValueError, match="empty"):
        list(las.decode_las(empty.read_bytes()))


def test_las_wkt_from_evlr():
    """1.4 files whose WKT CRS lives in an EVLR (common GDAL output)
    must not lose CRS on read: las_wkt falls back to the EVLR block.
    The EVLR is appended here by hand per the 1.4 spec (60-byte header,
    u64 payload length; header offset u64@235, count u32@243) — the
    engine writer itself emits a regular VLR, like the reference."""
    import struct

    pdf = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0], "z": [5.0, 6.0]})
    base = bytearray(las.encode_las(pdf, point_format=6))
    assert las.las_wkt(bytes(base)) is None
    wkt = 'PROJCS["evlr test"]'
    payload = wkt.encode() + b"\0"
    evlr = struct.pack("<H16sHQ32s", 0, b"LASF_Projection", 2112,
                       len(payload), b"WKT via EVLR") + payload
    off = len(base)
    base += evlr
    struct.pack_into("<Q", base, 235, off)   # EVLR offset
    struct.pack_into("<I", base, 243, 1)     # EVLR count
    assert las.las_wkt(bytes(base)) == wkt
    assert las.las_info(bytes(base))["wkt"] == wkt
    evlrs = las.parse_evlrs(bytes(base))
    assert len(evlrs) == 1 and evlrs[0]["user_id"] == "LASF_Projection"
    # point decode is unaffected by the trailing EVLR block
    got = pd.concat(las.decode_las(bytes(base)))
    assert list(got["x"]) == [1.0, 2.0]
    # pre-1.4 files return no EVLRs
    assert las.parse_evlrs(las.encode_las(pdf, point_format=1)) == []


# ------------------------------------------------- JPEG-in-TIFF (Compression 7)
# TIFF TechNote 2: strips/tiles are JPEG streams, optionally abbreviated
# against a shared JPEGTables tag (347). The reference rejects this
# variant (geotiff/mod.rs:424-432); the engine reads AND writes it via
# the in-repo T.81 codec.


def _jit_cfg(rows=20, cols=20):
    return GridConfig(rows=rows, cols=cols, north=1000.0, west=0.0,
                      res_x=50.0, res_y=50.0)


def test_jpeg_in_tiff_flat_strips_exact():
    # strip constants with (v-128) % 3 == 0 are fixed points of the
    # quality-90 DC chain -> the lossy codec roundtrips them EXACTLY
    cfg = _jit_cfg()
    g = np.empty((20, 20), np.uint8)
    for s, v in enumerate((98, 119, 140)):
        g[s * 8:(s + 1) * 8] = v
    data = geotiff.encode_geotiff(g, cfg, compression=7, rows_per_strip=8)
    cfg2, back = geotiff.decode_geotiff(data)
    assert np.array_equal(back.astype(np.uint8), g)
    assert (cfg2.rows, cfg2.cols) == (20, 20)


def test_jpeg_in_tiff_plumbing_adds_zero_loss():
    # container law: decode(tiff) == per-strip decode_jpeg(encode_jpeg)
    # for arbitrary (lossy) content, gray and RGB
    from whitebox_tools_spark.operators.jpeg_codec import (
        decode_jpeg, encode_jpeg)

    rng = np.random.RandomState(7)
    cfg = _jit_cfg()
    for shape in ((20, 20), (20, 20, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        data = geotiff.encode_geotiff(img, cfg, compression=7,
                                      rows_per_strip=8, jpeg_quality=75)
        _, back = geotiff.decode_geotiff_multi(data)
        want = np.vstack([
            decode_jpeg(encode_jpeg(img[s * 8:(s + 1) * 8], quality=75))
            for s in range(3)
        ])
        assert np.array_equal(back.astype(np.uint8), want)


def test_jpeg_in_tiff_partial_last_strip():
    cfg = _jit_cfg(rows=19)
    g = np.empty((19, 20), np.uint8)
    for s, v in enumerate((98, 119, 140)):
        g[s * 8:(s + 1) * 8] = v  # last strip is 3 rows
    data = geotiff.encode_geotiff(g, cfg, compression=7, rows_per_strip=8)
    _, back = geotiff.decode_geotiff(data)
    assert np.array_equal(back.astype(np.uint8), g)


def _split_abbreviated(stream: bytes):
    """Split a complete JPEG stream into (tables_stream, image_stream):
    DQT/DHT segments move to a tables-only stream (T.81 §B.5)."""
    import struct as _s

    tables = bytearray(b"\xFF\xD8")
    image = bytearray(b"\xFF\xD8")
    pos = 2
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xD9:
            image += stream[pos:pos + 2]
            break
        if marker == 0xDA:  # SOS: entropy data runs to EOI
            image += stream[pos:]
            break
        (seglen,) = _s.unpack_from(">H", stream, pos + 2)
        seg = stream[pos:pos + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else image).extend(seg)
        pos += 2 + seglen
    tables += b"\xFF\xD9"
    return bytes(tables), bytes(image)


def _build_jpegtables_tiff(tables: bytes, strips: list[bytes],
                           width: int, height: int, rps: int) -> bytes:
    """Minimal classic TIFF with a JPEGTables tag and abbreviated
    grayscale JPEG strips."""
    import struct as _s

    tag_rows = [
        (256, 4, 1, width, None), (257, 4, 1, height, None),
        (258, 3, 1, 8, None), (259, 3, 1, 7, None), (262, 3, 1, 1, None),
        (273, 4, len(strips), None, "offsets"),
        (277, 3, 1, 1, None), (278, 4, 1, rps, None),
        (279, 4, len(strips), None, "counts"),
        (339, 3, 1, 1, None), (347, 7, len(tables), None, "tables"),
    ]
    n = len(tag_rows)
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    placements = {}
    noff = len(strips)
    if noff > 1:
        placements["offsets"] = extra_off + len(extra)
        extra += b"\0" * (4 * noff)
        placements["counts"] = extra_off + len(extra)
        extra += _s.pack("<" + "I" * noff, *(len(s) for s in strips))
    if len(extra) & 1:
        extra += b"\0"
    placements["tables"] = extra_off + len(extra)
    extra += tables
    if len(extra) & 1:
        extra += b"\0"
    data_off = extra_off + len(extra)
    offs = []
    p = data_off
    for s in strips:
        offs.append(p)
        p += len(s)
    if noff > 1:
        extra[placements["offsets"] - extra_off:
              placements["offsets"] - extra_off + 4 * noff] = _s.pack(
                  "<" + "I" * noff, *offs)
    out = bytearray(b"II" + _s.pack("<HI", 42, ifd_off) + _s.pack("<H", n))
    for tag, ftype, count, val, role in tag_rows:
        out += _s.pack("<HHI", tag, ftype, count)
        if role == "offsets":
            out += _s.pack("<I", offs[0] if noff == 1 else placements["offsets"])
        elif role == "counts":
            out += _s.pack("<I", len(strips[0]) if noff == 1
                           else placements["counts"])
        elif role == "tables":
            out += _s.pack("<I", placements["tables"])
        elif ftype == 3:
            out += _s.pack("<HH", val, 0)
        else:
            out += _s.pack("<I", val)
    out += _s.pack("<I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def test_jpeg_in_tiff_jpegtables_abbreviated_read():
    # GDAL-style layout: shared DQT/DHT in tag 347, abbreviated strips
    from whitebox_tools_spark.operators.jpeg_codec import encode_jpeg

    g = np.empty((20, 20), np.uint8)
    for s, v in enumerate((98, 119, 140)):
        g[s * 8:(s + 1) * 8] = v
    full = [encode_jpeg(g[s * 8:(s + 1) * 8], quality=90) for s in range(3)]
    splits = [_split_abbreviated(f) for f in full]
    tables = splits[0][0]
    strips = [im for _, im in splits]
    data = _build_jpegtables_tiff(tables, strips, 20, 20, 8)
    _, back = geotiff.decode_geotiff(data)
    assert np.array_equal(back.astype(np.uint8), g)


def test_jpeg_in_tiff_writer_validation():
    cfg = _jit_cfg()
    with pytest.raises(ValueError, match="uint8"):
        geotiff.encode_geotiff(np.zeros((20, 20), np.float32), cfg,
                               compression=7)
    with pytest.raises(ValueError, match="predictor"):
        geotiff.encode_geotiff(np.zeros((20, 20), np.uint8), cfg,
                               compression=7, predictor=2)
    with pytest.raises(ValueError, match="palette"):
        geotiff.encode_geotiff(np.zeros((20, 20), np.uint8), cfg,
                               compression=7,
                               palette=np.zeros((4, 3), np.uint16))
    with pytest.raises(ValueError, match="samples/pixel"):
        geotiff.encode_geotiff(np.zeros((20, 20, 2), np.uint8), cfg,
                               compression=7)


def test_jpeg_in_tiff_reader_validation():
    cfg = _jit_cfg()
    data = bytearray(geotiff.encode_geotiff(
        np.full((20, 20), 128, np.uint8), cfg, compression=7))
    # flip SampleFormat (339) to 2 (signed) in the IFD -> reader rejects
    import struct as _s
    (n,) = _s.unpack_from("<H", data, 8)
    for i in range(n):
        tag, = _s.unpack_from("<H", data, 10 + 12 * i)
        if tag == 339:
            _s.pack_into("<H", data, 10 + 12 * i + 8, 2)
    with pytest.raises(ValueError, match="8-bit unsigned"):
        geotiff.decode_geotiff(bytes(data))


# --------------------------------------------------- tiled single-file write
# TIFF 6.0 §15 tiled layout (the GDAL/COG shape). The reader always
# handled tiles; the writer emits them with ``tile=(tw, th)``.


@pytest.mark.parametrize("dtype,comp,pred", [
    ("f4", 1, 1), ("f8", 8, 1), ("i2", 5, 2), ("u1", 8, 1)])
def test_geotiff_tiled_write_roundtrip(dtype, comp, pred):
    g = _demo_grid(dtype)
    data = geotiff.encode_geotiff(g, CFG, compression=comp, predictor=pred,
                                  tile=(16, 16))
    tags = geotiff.print_geotiff_tags(data)
    assert tags["TileWidth"] == (16,) and tags["TileLength"] == (16,)
    assert "RowsPerStrip" not in tags and "StripOffsets" not in tags
    cfg2, g2 = geotiff.decode_geotiff(data)
    assert np.array_equal(g2.astype(dtype), g)
    assert (cfg2.rows, cfg2.cols) == (CFG.rows, CFG.cols)


def test_geotiff_tiled_multiband_and_bigtiff():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (CFG.rows, CFG.cols, 3)).astype(np.uint8)
    for big in (False, True):
        data = geotiff.encode_geotiff(img, CFG, tile=(16, 32), big=big)
        _, back = geotiff.decode_geotiff_multi(data)
        assert np.array_equal(back.astype(np.uint8), img)


def test_geotiff_tiled_jpeg_flat_exact():
    cfg = GridConfig(rows=32, cols=32, north=0.0, west=0.0,
                     res_x=1.0, res_y=1.0)
    g = np.empty((32, 32), np.uint8)
    g[:16, :16], g[:16, 16:], g[16:, :16], g[16:, 16:] = 98, 119, 140, 128
    data = geotiff.encode_geotiff(g, cfg, compression=7, tile=(16, 16))
    _, back = geotiff.decode_geotiff(data)
    assert np.array_equal(back.astype(np.uint8), g)


def test_geotiff_tile_size_validation():
    g = np.zeros((20, 20), np.uint8)
    for bad in ((15, 16), (16, 0), (-16, 16)):
        with pytest.raises(ValueError, match="multiples of 16"):
            geotiff.encode_geotiff(g, CFG, tile=bad)


# ------------------------------------------------- COG overview pyramids
# Multi-IFD files: full-resolution IFD + chained reduced-resolution
# IFDs (NewSubfileType 1), the Cloud-Optimized GeoTIFF layout.


@pytest.mark.parametrize("big", [False, True])
@pytest.mark.parametrize("comp", [1, 5, 8])
def test_cog_overview_pyramid_roundtrip(big, comp):
    g = _demo_grid("f8")
    data = geotiff.encode_geotiff_overviews(g, CFG, overviews=3,
                                            compression=comp, big=big)
    assert geotiff.count_overviews(data) == 3
    _, full = geotiff.decode_geotiff_multi(data, ifd=0)
    assert np.array_equal(full[:, :, 0], g)
    lv = g
    res = CFG.res_x
    for k in (1, 2, 3):
        lv = lv[::2, ::2]  # 'nearest' = exact top-left decimation
        res *= 2
        ck, a = geotiff.decode_geotiff_multi(data, ifd=k)
        assert np.array_equal(a[:, :, 0], lv)
        assert (ck.rows, ck.cols) == lv.shape
        assert ck.res_x == res
    # the primary decode path ignores the chain (reference parity:
    # single-IFD readers read the full image)
    _, d = geotiff.decode_geotiff(data)
    assert np.array_equal(d, g)


def test_cog_mean_resample_and_tiled():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (CFG.rows, CFG.cols, 3)).astype(np.uint8)
    data = geotiff.encode_geotiff_overviews(img, CFG, overviews=2,
                                            resample="mean", tile=(16, 16))
    _, a1 = geotiff.decode_geotiff_multi(data, ifd=1)
    assert np.array_equal(a1.astype(np.uint8), geotiff._downsample2(img, "mean"))
    _, a2 = geotiff.decode_geotiff_multi(data, ifd=2)
    want2 = geotiff._downsample2(geotiff._downsample2(img, "mean"), "mean")
    assert np.array_equal(a2.astype(np.uint8), want2)


def test_cog_mean_edge_blocks_average_what_exists():
    # odd dims: edge 2x2 blocks are partial; mean divides by the count
    g = np.array([[0, 10, 20], [30, 40, 50], [60, 70, 80]], np.float64)
    got = geotiff._downsample2(g, "mean")
    want = np.array([[20.0, 35.0], [65.0, 80.0]])
    np.testing.assert_array_equal(got, want)


def test_cog_validation_and_limits():
    g = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="overviews"):
        geotiff.encode_geotiff_overviews(g, CFG, overviews=-1)
    with pytest.raises(ValueError, match="resample"):
        geotiff.encode_geotiff_overviews(g, CFG, overviews=1, resample="cubic")
    # pyramid stops when a dimension hits 1 instead of emitting empties
    data = geotiff.encode_geotiff_overviews(g, CFG, overviews=10)
    assert geotiff.count_overviews(data) == 2  # 4 -> 2 -> 1, then stop
    with pytest.raises(ValueError, match="out of range"):
        geotiff.decode_geotiff_multi(data, ifd=9)


def test_cog_subfile_type_tagged():
    import struct as _s
    g = _demo_grid("f4")
    data = geotiff.encode_geotiff_overviews(g, CFG, overviews=1)
    bo, big, offs = geotiff._ifd_chain(data)
    assert len(offs) == 2
    tags1 = geotiff._read_ifd_entries(data, offs[1], bo, big=big)
    assert tags1[254] == (1,)  # NewSubfileType reduced-resolution
    tags0 = geotiff._read_ifd_entries(data, offs[0], bo, big=big)
    assert 254 not in tags0


# --------------------------------------------------------- PackBits encode


@pytest.mark.parametrize("dtype", ["f4", "u1", "i2"])
@pytest.mark.parametrize("layout", [{"rows_per_strip": 8}, {"tile": (16, 16)}])
def test_geotiff_packbits_encode_roundtrip(dtype, layout):
    g = _demo_grid(dtype)
    data = geotiff.encode_geotiff(g, CFG, compression=32773, **layout)
    assert geotiff.print_geotiff_tags(data)["Compression"] == (32773,)
    _, g2 = geotiff.decode_geotiff(data)
    assert np.array_equal(g2.astype(dtype), g)


def test_packbits_raw_law():
    from whitebox_tools_spark.io.geotiff import _packbits, _unpackbits
    rng = np.random.RandomState(5)
    for _ in range(100):
        n, rb = rng.randint(1, 600), rng.randint(1, 40)
        pool = 4 if rng.rand() < 0.5 else 256  # runs likely / incompressible
        raw = bytes(rng.randint(0, pool, n).astype(np.uint8))
        assert _unpackbits(_packbits(raw, rb)) == raw
    # replicate runs longer than one control byte's 128-max
    raw = b"\x07" * 1000 + b"\x01\x02" + b"\x00" * 300
    assert _unpackbits(_packbits(raw, 5000)) == raw
