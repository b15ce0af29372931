"""BufferVector outline + Dissolve merged-boundary geometry."""

import math

from pyspark.sql import functions as F

from whitebox_tools_spark.localrel import local_df
from whitebox_tools_spark.operators.misc6 import buffer_vector_geometry
from whitebox_tools_spark.operators.vector_ops import dissolve_geometry
from whitebox_tools_spark.sources import vectors


def test_buffer_ring_rect(spark):
    layer = local_df(spark, vectors.layer_to_rows(vectors.rect_layer()))
    out = buffer_vector_geometry(layer, 30.0, arc_segments=4)
    rows = out.where(F.col("fid") == 1).orderBy("vi").collect()
    # 4 vertices x (4+1) arc points
    assert len(rows) == 20
    # every vertex is exactly 30 from the rect boundary: corners arc at
    # distance 30 from the corner, edges offset by 30
    xmin, ymin, xmax, ymax = 100.0, 100.0, 400.0, 350.0
    for r in rows:
        dx = max(xmin - r.x, 0.0, r.x - xmax)
        dy = max(ymin - r.y, 0.0, r.y - ymax)
        assert math.isclose(math.hypot(dx, dy), 30.0, abs_tol=1e-9)
    # ring is CCW
    p = [(r.x, r.y) for r in rows]
    s = sum(
        p[i][0] * p[(i + 1) % len(p)][1] - p[(i + 1) % len(p)][0] * p[i][1]
        for i in range(len(p))
    )
    assert s > 0


def test_dissolve_cancels_shared_edges(spark):
    layer = local_df(spark, vectors.touch_layer_rows())
    out = dissolve_geometry(layer, "val").collect()
    edges = {(r.key, r.x1, r.y1, r.x2, r.y2) for r in out}
    # the full shared edge x=100 between fids 1 and 2 is gone
    assert (1, 100.0, 0.0, 100.0, 100.0) not in edges
    # the shared edge y=100 between fids 2 and 3 is gone
    assert (1, 100.0, 100.0, 200.0, 100.0) not in edges
    # outer boundary survives
    assert (1, 0.0, 0.0, 0.0, 100.0) in edges
    assert (2, 300.0, 300.0, 300.0, 400.0) in edges
    # group 2: shared edge x=400 gone
    assert (2, 400.0, 300.0, 400.0, 400.0) not in edges
