"""KMeans / Strahler order / viewshed: parity vs in-python replays."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.operators import hydro, trend
from whitebox_tools_spark.operators.cluster import kmeans, strahler_order, viewshed
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.operators.raster import points_to_raster
from whitebox_tools_spark.sources.docs import synth_docs
from whitebox_tools_spark.sources.tables import documents

SF_DIR = "/root/testdata/sf0.001"
GRID = GridConfig(rows=20, cols=20, north=1000.0, west=0.0, res_x=50.0, res_y=50.0)


def _np_kmeans(X, ids, k, max_iter=20):
    order = np.argsort(ids)
    X = X[order]
    centers = X[:k].copy()
    assign = None
    for _ in range(max_iter):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        new_centers = centers.copy()
        for c in range(k):
            m = assign == c
            if m.any():
                new_centers[c] = np.round(X[m].mean(axis=0), 6)
        if np.allclose(new_centers, centers, rtol=0, atol=0):
            break
        centers = new_centers
    return {int(i): int(a) for i, a in zip(np.asarray(ids)[order], assign)}


class TestKMeans:
    def test_matches_numpy_lloyd(self, spark):
        docs = derive.with_geometry(synth_docs(spark, 400), "doc_num")
        assigned, centers = kmeans(docs, ["x", "y", "z"], k=4, record="doc_num")
        got = {r["doc_num"]: r["cluster"] for r in assigned.collect()}

        rows = docs.select("doc_num", "x", "y", "z").collect()
        ids = np.array([r["doc_num"] for r in rows])
        X = np.array([[r["x"], r["y"], r["z"]] for r in rows])
        expect = _np_kmeans(X, ids, 4)
        agree = sum(1 for i in got if got[i] == expect[i]) / len(got)
        assert agree > 0.99, agree  # float tie-breaks may differ on epsilon

    def test_deterministic(self, spark):
        docs = derive.with_geometry(synth_docs(spark, 300), "doc_num")
        a1, c1 = kmeans(docs, ["x", "y"], k=3, record="doc_num")
        a2, c2 = kmeans(docs, ["x", "y"], k=3, record="doc_num")
        assert c1 == c2
        assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def _np_strahler(stream_ids, down_map):
    order = {i: 1 for i in stream_ids}
    for _ in range(100):
        changed = False
        up = {}
        for a, b in down_map.items():
            if a in order and b in order:
                up.setdefault(b, []).append(order[a])
        for b, ups in up.items():
            mx = max(ups)
            new = mx + 1 if ups.count(mx) >= 2 else mx
            new = max(new, 1)
            if order[b] != new:
                order[b] = new
                changed = True
        if not changed:
            break
    return order


class TestStrahler:
    def test_matches_replay(self, spark):
        geo = derive.with_geometry(documents(spark, SF_DIR), "doc_id")
        z = points_to_raster(geo, GRID, assign="last")
        accum = hydro.d8_flow_accumulation(z, GRID, tile_size=8)
        streams = trend.extract_streams(accum, 2.0)
        from whitebox_tools_spark.operators.focal import focal_apply
        from whitebox_tools_spark.operators.hydro import _d8_dir_stencil, D8_DX, D8_DY

        dirs = focal_apply(z, GRID, _d8_dir_stencil(GRID, as_index=True), 1, 8).select(
            "row", "col", F.col("value").cast("int").alias("dir")
        )
        got = {
            (r["row"], r["col"]): r["value"]
            for r in strahler_order(streams, dirs, GRID).collect()
        }
        # replay
        s_cells = {
            (r["row"], r["col"])
            for r in streams.where(F.col("value") == 1.0).collect()
        }
        d_map = {}
        dir_map = {(r["row"], r["col"]): r["dir"] for r in dirs.collect()}
        ids = {rc: rc[0] * GRID.cols + rc[1] for rc in s_cells}
        for rc in s_cells:
            d = dir_map.get(rc, -1)
            if d >= 0:
                tgt = (rc[0] + D8_DY[d], rc[1] + D8_DX[d])
                if tgt in s_cells:
                    d_map[ids[rc]] = ids[tgt]
        expect = _np_strahler(set(ids.values()), d_map)
        assert len(got) == len(s_cells) > 0
        for rc, v in got.items():
            assert v == expect[ids[rc]], (rc, v, expect[ids[rc]])


class TestViewshed:
    def test_self_visible_and_flat_world(self, spark):
        # flat DEM: everything is visible from anywhere
        flat = spark.createDataFrame(
            [(r, c, 10.0) for r in range(20) for c in range(20)],
            "row long, col long, value double",
        )
        out = viewshed(flat, GRID, [(10, 10)])
        vals = [r["value"] for r in out.collect()]
        assert len(vals) == 400
        assert all(v == 1.0 for v in vals)

    def test_wall_blocks(self, spark):
        # a tall wall at col 10 hides everything beyond it from col 0
        cells = []
        for r in range(20):
            for c in range(20):
                z = 100.0 if c == 10 else 0.0
                cells.append((r, c, z))
        dem = spark.createDataFrame(cells, "row long, col long, value double")
        out = {
            (r["row"], r["col"]): r["value"]
            for r in viewshed(dem, GRID, [(10, 0)]).collect()
        }
        assert out[(10, 5)] == 1.0  # before the wall
        assert out[(10, 10)] == 1.0  # wall top visible
        assert out[(10, 15)] == 0.0  # behind the wall


class TestViewshedSweep:
    def _terrain(self, spark, seed=9):
        import numpy as np
        rng = np.random.default_rng(seed)
        z = rng.uniform(0.0, 30.0, (20, 20)).round(2)
        return spark.createDataFrame(
            [(r, c, float(z[r, c])) for r in range(20) for c in range(20)],
            "row long, col long, value double",
        )

    def test_flat_and_wall(self, spark):
        from whitebox_tools_spark.operators.cluster import viewshed_sweep
        flat = spark.createDataFrame(
            [(r, c, 10.0) for r in range(20) for c in range(20)],
            "row long, col long, value double",
        )
        out = viewshed_sweep(flat, GRID, [(10, 10)])
        vals = [r["value"] for r in out.collect()]
        assert len(vals) == 400 and all(v == 1.0 for v in vals)
        cells = [(r, c, 100.0 if c == 10 else 0.0)
                 for r in range(20) for c in range(20)]
        dem = spark.createDataFrame(cells, "row long, col long, value double")
        got = {(r["row"], r["col"]): r["value"]
               for r in viewshed_sweep(dem, GRID, [(10, 0)]).collect()}
        assert got[(10, 5)] == 1.0
        assert got[(10, 10)] == 1.0
        assert got[(10, 15)] == 0.0

    def test_agreement_with_sampled_ray(self, spark):
        """Documented tolerance vs the parity engine: the sweep's bucket
        discretization differs from nearest-cell ray resampling only on
        grazing rays — require >= 95% per-cell agreement on random
        terrain from three viewpoints (measured ~98% on this fixture)."""
        from whitebox_tools_spark.operators.cluster import viewshed_sweep
        dem = self._terrain(spark)
        vps = [(3, 3), (10, 10), (15, 4)]
        ray = {(r["vp"], r["row"], r["col"]): r["value"]
               for r in viewshed(dem, GRID, vps).collect()}
        swp = {(r["vp"], r["row"], r["col"]): r["value"]
               for r in viewshed_sweep(dem, GRID, vps).collect()}
        assert set(ray) == set(swp)
        agree = sum(1 for k in ray if ray[k] == swp[k])
        frac = agree / len(ray)
        assert frac >= 0.95, f"sweep agreement {frac:.3f} < 0.95"
