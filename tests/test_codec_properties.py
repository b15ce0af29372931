"""Property-based (hypothesis) roundtrip laws for the byte codecs.

Each property drives the pure-numpy encode/decode pair over randomized
shapes/dtypes/values (seeded generators — reproducible shrink cases) and
asserts the exact roundtrip law the format guarantees: bit-identity for
lossless paths, the documented quantization for LAS. These complement
the fixture tests with the corners a hand-written case misses (1xN and
Nx1 grids, strip-boundary-straddling heights, wraparound differences,
empty-ish ranges).
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from whitebox_tools_spark.io import geotiff, las, shapefile  # noqa: E402
from whitebox_tools_spark.operators.gridding import GridConfig  # noqa: E402

_SETTINGS = dict(max_examples=25, deadline=None)


def _cfg(rows, cols):
    return GridConfig(rows=rows, cols=cols, north=500.0, west=100.0,
                      res_x=5.0, res_y=5.0)


@settings(**_SETTINGS)
@given(
    seed=st.integers(0, 2**32 - 1),
    rows=st.integers(1, 40),
    cols=st.integers(1, 40),
    dtype=st.sampled_from(["u1", "u2", "i2", "i4", "f4", "f8"]),
    compression=st.sampled_from([1, 8]),
    rps=st.integers(1, 48),
    big=st.booleans(),
)
def test_geotiff_roundtrip_law(seed, rows, cols, dtype, compression, rps, big):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        g = rng.normal(0, 1e4, size=(rows, cols)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        g = rng.integers(info.min, info.max, size=(rows, cols),
                         endpoint=True).astype(dtype)
    data = geotiff.encode_geotiff(g, _cfg(rows, cols), compression=compression,
                                  rows_per_strip=rps, big=big)
    cfg2, back = geotiff.decode_geotiff(data)
    assert (cfg2.rows, cfg2.cols) == (rows, cols)
    np.testing.assert_array_equal(back, g.astype(np.float64))


@settings(**_SETTINGS)
@given(
    seed=st.integers(0, 2**32 - 1),
    rows=st.integers(1, 40),
    cols=st.integers(1, 40),
    dtype=st.sampled_from(["u1", "u2", "i2", "i4"]),
    rps=st.integers(1, 48),
)
def test_geotiff_predictor2_law(seed, rows, cols, dtype, rps):
    """Differencing wraps modularly in the sample dtype; the decode
    cumsum must invert it exactly for EVERY value pattern."""
    rng = np.random.default_rng(seed)
    info = np.iinfo(dtype)
    g = rng.integers(info.min, info.max, size=(rows, cols),
                     endpoint=True).astype(dtype)
    data = geotiff.encode_geotiff(g, _cfg(rows, cols), rows_per_strip=rps,
                                  predictor=2)
    _, back = geotiff.decode_geotiff(data)
    np.testing.assert_array_equal(back, g.astype(np.float64))


@settings(**_SETTINGS)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 200),
    fmt=st.sampled_from([0, 1, 2, 3, 6, 7, 8]),
)
def test_las_quantization_law(seed, n, fmt):
    """Coordinates decode to exactly floor(v/0.001+0.5)*0.001+offset with
    offset = floor(min(coord)) — the documented tie-free quantization."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "x": rng.uniform(-1000, 1000, n),
        "y": rng.uniform(-1000, 1000, n),
        "z": rng.uniform(-50, 50, n),
        "intensity": rng.integers(0, 65535, n),
        "classification": rng.integers(0, 31 if fmt >= 6 else 31, n),
    })
    data = las.encode_las(pdf, point_format=fmt)
    got = pd.concat(list(las.decode_las(data)), ignore_index=True)
    for c in ("x", "y", "z"):
        off = np.floor(pdf[c].min())
        want = np.floor((pdf[c] - off) / 0.001 + 0.5) * 0.001 + off
        np.testing.assert_allclose(got[c], want, rtol=0, atol=0)
    np.testing.assert_array_equal(got["intensity"], pdf["intensity"])


@settings(**_SETTINGS)
@given(
    seed=st.integers(0, 2**32 - 1),
    nrec=st.integers(1, 12),
    stype=st.sampled_from([
        shapefile.SHP_POLYLINE, shapefile.SHP_POLYLINE_Z,
        shapefile.SHP_POLYLINE_M,
    ]),
)
def test_shapefile_roundtrip_law(seed, nrec, stype):
    """Vertices (and z/m payloads where the type carries them) are
    f8-lossless through .shp encode/decode for every record count and
    part shape."""
    rng = np.random.default_rng(seed)
    recs = []
    for _ in range(nrec):
        nparts = int(rng.integers(1, 4))
        parts, zs, ms = [], [], []
        for _ in range(nparts):
            npts = int(rng.integers(2, 9))
            parts.append(rng.uniform(-1e5, 1e5, size=(npts, 2)))
            zs.append(rng.uniform(-100, 100, npts))
            ms.append(rng.uniform(0, 1, npts))
        recs.append(shapefile.ShapeRecord(
            parts=parts, shape_type=stype,
            zs=zs if stype == shapefile.SHP_POLYLINE_Z else None,
            ms=ms if stype != shapefile.SHP_POLYLINE else None,
        ))
    shp, _, _ = shapefile.encode_shapefile(recs)
    got = shapefile.decode_shapefile(shp)
    assert len(got) == nrec
    for rec, out in zip(recs, got):
        assert len(out.parts) == len(rec.parts)
        for p, q in zip(rec.parts, out.parts):
            np.testing.assert_array_equal(q, p)
        if stype == shapefile.SHP_POLYLINE_Z:
            for z, w in zip(rec.zs, out.zs):
                np.testing.assert_array_equal(w, z)
        if stype in (shapefile.SHP_POLYLINE_Z, shapefile.SHP_POLYLINE_M):
            for m, w in zip(rec.ms, out.ms):
                np.testing.assert_array_equal(w, m)
