"""Vector overlay + line-editing family (SURVEY.md §2.2/§2.4): polygon
overlay areas via a Sutherland-Hodgman convex-clip kernel, attribute
dissolve, vertex smoothing / extension, segment merging and splitting,
patch narrowness.

Overlay semantics: the engine computes real intersection polygons
(S-H; clip side must be convex, which every fixture clip window is) and
derives Erase / Union / SymmetricalDifference measures by inclusion-
exclusion over them — the relational decomposition of the reference's
geometry stitching (gis_analysis/clip.rs, intersect.rs, union.rs),
which keeps every step a join or aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.kernels.geometry import polygon_area
from whitebox_tools_spark.operators.gridding import GridConfig


def sutherland_hodgman(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Clip an (open-ring) subject polygon by a CONVEX clip polygon.
    Rings may wind either way; the clip ring is normalized to CCW."""
    c = np.asarray(clip, dtype=np.float64)
    # signed area (y-up): CCW positive
    x, y = c[:, 0], c[:, 1]
    if (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0:
        c = c[::-1]
    out = [tuple(p) for p in np.asarray(subject, dtype=np.float64)]
    n = len(c)
    for i in range(n):
        ax, ay = c[i]
        bx, by = c[(i + 1) % n]
        inp = out
        out = []
        if not inp:
            break
        for j in range(len(inp)):
            px, py = inp[j - 1]
            qx, qy = inp[j]
            p_in = (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0.0
            q_in = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax) >= 0.0
            if q_in:
                if not p_in:
                    out.append(_isect(px, py, qx, qy, ax, ay, bx, by))
                out.append((qx, qy))
            elif p_in:
                out.append(_isect(px, py, qx, qy, ax, ay, bx, by))
    return np.array(out, dtype=np.float64) if out else np.zeros((0, 2))


def _isect(px, py, qx, qy, ax, ay, bx, by):
    dx, dy = qx - px, qy - py
    ex, ey = bx - ax, by - ay
    denom = dx * ey - dy * ex
    t = ((ax - px) * ey - (ay - py) * ex) / denom
    return (px + t * dx, py + t * dy)


def polygon_overlay_areas(
    layer_a: DataFrame, layer_b: DataFrame, cell: float | None = None
) -> DataFrame:
    """Intersection area of every (shell_a, shell_b) part pair whose
    bboxes overlap — the Clip / Intersect area core. Inputs: the
    relational layer form (fid, part, is_hole, xs, ys, bbox cols).

    Candidate pairs come from the grid-cell bbox EQUI-join
    (operators/bbox_join.py) — never a nested-loop theta-join."""
    from whitebox_tools_spark.operators.bbox_join import bbox_join

    a = layer_a.where(~F.col("is_hole")).select(
        F.col("fid").alias("fid_a"), F.col("xs").alias("xs_a"), F.col("ys").alias("ys_a"),
        F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
        F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"),
    )
    b = layer_b.where(~F.col("is_hole")).select(
        F.col("fid").alias("fid_b"), F.col("xs").alias("xs_b"), F.col("ys").alias("ys_b"),
        F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
        F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"),
    )
    j = bbox_join(a, b, cell=cell)

    schema = T.StructType(
        [
            T.StructField("fid_a", T.LongType()),
            T.StructField("fid_b", T.LongType()),
            T.StructField("inter_area", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples(index=False):
            subj = np.column_stack([np.asarray(r.xs_a), np.asarray(r.ys_a)])
            clip = np.column_stack([np.asarray(r.xs_b), np.asarray(r.ys_b)])
            # drop closing vertices if present
            if len(subj) > 1 and (subj[0] == subj[-1]).all():
                subj = subj[:-1]
            if len(clip) > 1 and (clip[0] == clip[-1]).all():
                clip = clip[:-1]
            poly = sutherland_hodgman(subj, clip)
            area = float(polygon_area(poly)) if len(poly) >= 3 else 0.0
            rows.append((int(r.fid_a), int(r.fid_b), area))
        return pd.DataFrame(rows, columns=["fid_a", "fid_b", "inter_area"])

    return j.mapInPandas(lambda it: (run(pdf) for pdf in it), schema=schema)


def overlay_measures(layer_a: DataFrame, layer_b: DataFrame) -> DataFrame:
    """Per subject feature of layer A: its shell area, total intersection
    with layer B's (disjoint) shells, and the derived Clip / Erase areas
    (Intersect = inter_area, Erase/Difference = area - inter_area)."""
    from whitebox_tools_spark.operators.measures import part_area

    inter = polygon_overlay_areas(layer_a, layer_b)
    per = inter.groupBy("fid_a").agg(F.sum("inter_area").alias("inter_area"))
    areas = (
        layer_a.where(~F.col("is_hole"))
        .select("fid", part_area(F.col("xs"), F.col("ys")).alias("area"))
        .groupBy("fid")
        .agg(F.sum("area").alias("area"))
    )
    return (
        areas.join(per.withColumnRenamed("fid_a", "fid"), "fid", "left")
        .select(
            "fid",
            "area",
            F.coalesce("inter_area", F.lit(0.0)).alias("clip_area"),
            (F.col("area") - F.coalesce("inter_area", F.lit(0.0))).alias("erase_area"),
        )
    )


def dissolve(layer: DataFrame, attr: str) -> DataFrame:
    """Dissolve (gis_analysis/dissolve.rs) measures: group features by an
    attribute; area = sum(shells) - sum(holes), parts counted. The merged
    boundary itself comes from dissolve_geometry below."""
    from whitebox_tools_spark.operators.measures import part_area

    m = layer.select(
        F.col(attr).alias("key"),
        "is_hole",
        part_area(F.col("xs"), F.col("ys")).alias("area"),
    )
    return m.groupBy("key").agg(
        F.sum(F.when(F.col("is_hole"), -F.col("area")).otherwise(F.col("area"))).alias(
            "area"
        ),
        F.count(F.lit(1)).alias("n_parts"),
    )


def smooth_vectors(paths: DataFrame, filter_size: int = 3) -> DataFrame:
    """SmoothVectors (gis_analysis/smooth_vectors.rs, 3-vertex form):
    interior vertices become the mean of themselves and their two
    neighbours; endpoints stay. Input: (seg_id, xs, ys) polylines."""
    idx = F.posexplode(F.arrays_zip("xs", "ys"))
    v = paths.select("seg_id", F.size("xs").alias("n"), idx.alias("i", "p"))
    x = F.col("p.xs")
    y = F.col("p.ys")
    w = Window.partitionBy("seg_id").orderBy("i")
    sx = F.when(
        (F.col("i") > 0) & (F.col("i") < F.col("n") - 1),
        (F.lag(x).over(w) + x + F.lead(x).over(w)) / 3.0,
    ).otherwise(x)
    sy = F.when(
        (F.col("i") > 0) & (F.col("i") < F.col("n") - 1),
        (F.lag(y).over(w) + y + F.lead(y).over(w)) / 3.0,
    ).otherwise(y)
    return v.select("seg_id", "i", sx.alias("x"), sy.alias("y"))


def extend_vector_lines(paths: DataFrame, dist: float) -> DataFrame:
    """ExtendVectorLines (gis_analysis/extend_vector_lines.rs): move each
    endpoint outward by ``dist`` along its end-segment direction."""
    idx = F.posexplode(F.arrays_zip("xs", "ys"))
    v = paths.select("seg_id", F.size("xs").alias("n"), idx.alias("i", "p")).select(
        "seg_id", "n", "i", F.col("p.xs").alias("x"), F.col("p.ys").alias("y")
    )
    w = Window.partitionBy("seg_id").orderBy("i")
    nx, ny = F.lead("x").over(w), F.lead("y").over(w)
    px, py = F.lag("x").over(w), F.lag("y").over(w)
    d_start = F.sqrt((nx - F.col("x")) * (nx - F.col("x")) + (ny - F.col("y")) * (ny - F.col("y")))
    d_end = F.sqrt((F.col("x") - px) * (F.col("x") - px) + (F.col("y") - py) * (F.col("y") - py))
    ex = (
        F.when(F.col("i") == 0, F.col("x") - dist * (nx - F.col("x")) / d_start)
        .when(F.col("i") == F.col("n") - 1, F.col("x") + dist * (F.col("x") - px) / d_end)
        .otherwise(F.col("x"))
    )
    ey = (
        F.when(F.col("i") == 0, F.col("y") - dist * (ny - F.col("y")) / d_start)
        .when(F.col("i") == F.col("n") - 1, F.col("y") + dist * (F.col("y") - py) / d_end)
        .otherwise(F.col("y"))
    )
    return v.select("seg_id", "i", ex.alias("x"), ey.alias("y"))


def merge_line_segments(segments: DataFrame) -> DataFrame:
    """MergeLineSegments (gis_analysis/merge_line_segments.rs): segments
    sharing an endpoint merge into one chain; chain id = dense rank of
    the chain's min seg_id (canonical)."""
    from whitebox_tools_spark.operators.graph import connected_components

    ends = segments.select(
        "seg_id",
        F.array(
            F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
            F.struct(F.col("x2").alias("x"), F.col("y2").alias("y")),
        ).alias("es"),
    ).select("seg_id", F.explode("es").alias("e"))
    pairs = (
        ends.alias("u")
        .join(
            ends.alias("v"),
            (F.col("u.e.x") == F.col("v.e.x")) & (F.col("u.e.y") == F.col("v.e.y"))
            & (F.col("u.seg_id") < F.col("v.seg_id")),
        )
        .select(F.col("u.seg_id").alias("a"), F.col("v.seg_id").alias("b"))
        .distinct()
    )
    nodes = segments.select(F.col("seg_id").alias("id"))
    comps = connected_components(pairs, nodes, "id")
    first = comps.groupBy("comp").agg(F.min("node").alias("first_id"))
    ranked = first.withColumn("chain", F.row_number().over(Window.orderBy("first_id")))
    return comps.join(ranked, "comp").select(
        F.col("node").alias("seg_id"), F.col("chain").cast("double").alias("chain")
    )


def split_with_lines(l1: DataFrame, l2: DataFrame) -> DataFrame:
    """SplitWithLines (gis_analysis/split_with_lines.rs): split every
    layer-1 segment at its intersections with layer-2 segments; output
    one row per piece with its length (pieces ordered by the parametric
    position)."""
    from whitebox_tools_spark.operators.cost import line_intersections

    pts = line_intersections(l1, l2)
    seg = l1.select(
        F.col("seg_id").alias("s1"), "x1", "y1", "x2", "y2",
        F.sqrt(
            (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
            + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
        ).alias("len"),
    )
    with_t = pts.join(seg, "s1").select(
        "s1", "len",
        F.when(
            F.abs(F.col("x2") - F.col("x1")) >= F.abs(F.col("y2") - F.col("y1")),
            (F.col("x") - F.col("x1")) / (F.col("x2") - F.col("x1")),
        )
        .otherwise((F.col("y") - F.col("y1")) / (F.col("y2") - F.col("y1")))
        .alias("t"),
    )
    bounds = with_t.select("s1", "len", "t").unionByName(
        seg.select("s1", "len", F.lit(0.0).alias("t"))
    ).unionByName(seg.select("s1", "len", F.lit(1.0).alias("t")))
    w = Window.partitionBy("s1").orderBy("t")
    pieces = (
        bounds.distinct()
        .withColumn("t2", F.lead("t").over(w))
        .where(F.col("t2").isNotNull())
        .withColumn("piece", F.row_number().over(w))
    )
    return pieces.select(
        "s1", "piece", ((F.col("t2") - F.col("t")) * F.col("len")).alias("length")
    )


def dissolve_geometry(layer: DataFrame, attr: str) -> DataFrame:
    """Dissolve (gis_analysis/dissolve.rs) merged-boundary form: features
    sharing ``attr`` merge by deleting the boundaries interior to the
    group — an undirected ring edge survives iff it appears exactly once
    within its group (a boundary shared by two snapped features appears
    twice and cancels). Exact whenever adjacent features share complete
    edges (the shapefile dissolve precondition of coincident vertices).
    One Generate + one groupBy on (group, canonical edge) — a single
    shuffle, no geometry kernels, scale-safe.

    Output: (key, x1, y1, x2, y2) canonical surviving edges.
    """
    n = F.size("xs") - 1  # closed rings
    edges = (
        layer.select(F.col(attr).alias("key"), "xs", "ys")
        .select(
            "key",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.struct(
                        F.element_at("xs", i.cast("int")).alias("ax"),
                        F.element_at("ys", i.cast("int")).alias("ay"),
                        F.element_at("xs", (i + 1).cast("int")).alias("bx"),
                        F.element_at("ys", (i + 1).cast("int")).alias("by"),
                    ),
                )
            ).alias("e"),
        )
    )
    fwd = (F.col("e.ax") < F.col("e.bx")) | (
        (F.col("e.ax") == F.col("e.bx")) & (F.col("e.ay") <= F.col("e.by"))
    )
    canon = edges.select(
        "key",
        F.when(fwd, F.col("e.ax")).otherwise(F.col("e.bx")).alias("x1"),
        F.when(fwd, F.col("e.ay")).otherwise(F.col("e.by")).alias("y1"),
        F.when(fwd, F.col("e.bx")).otherwise(F.col("e.ax")).alias("x2"),
        F.when(fwd, F.col("e.by")).otherwise(F.col("e.ay")).alias("y2"),
    )
    return (
        canon.groupBy("key", "x1", "y1", "x2", "y2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") == 1)
        .select("key", "x1", "y1", "x2", "y2")
    )


def nearest_different_distance(raster: DataFrame, cfg: GridConfig) -> DataFrame:
    """Exact distance from every positive cell to the nearest in-grid
    cell holding a DIFFERENT (non-null) value — ONE pass for all classes.

    Target reduction: the nearest different-valued cell is always a
    *boundary* cell (a cell with a 4-neighbour whose value differs or is
    nodata) — an interior cell y always has a same-valued 4-neighbour
    strictly closer to the query, so y can never be the argmin. Targets
    therefore shrink from O(cells) to O(region perimeter).

    Plan shape (the separable-EDT pattern of
    :func:`whitebox_tools_spark.operators.hydro.euclidean_distance`, with
    the column partition widened to (column, label)):
      boundary: one 4-neighbour equi-join + one aggregate;
      phase 1: per (target column, label), the nearest target row for
        every grid row — two last_value window scans;
      phase 2: per grid ROW, cogrouped numpy min over candidates whose
        label differs from the cell's own class.
    No per-class driver loop, no inequality join; 4 shuffles total for
    any number of classes.

    Output: (row, col, cls, dd) for value > 0 cells; dd = +inf when no
    different-valued cell exists.
    """
    cells = raster.where(F.col("value").isNotNull()).select(
        "row", "col", F.col("value").alias("lab")
    )
    pos = cells.where(F.col("lab") > 0.0).select(
        "row", "col", F.col("lab").alias("cls")
    )

    # boundary cells: any in-grid 4-neighbour missing (nodata) or
    # different-valued
    offs = F.array(
        *[
            F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
            for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1))
        ]
    )
    nb = cells.select(
        "row", "col", "lab", F.explode(offs).alias("o")
    ).select(
        "row",
        "col",
        "lab",
        (F.col("row") + F.col("o.dr")).alias("nr"),
        (F.col("col") + F.col("o.dc")).alias("nc"),
    )
    in_grid = (
        (F.col("nr") >= 0)
        & (F.col("nr") < cfg.rows)
        & (F.col("nc") >= 0)
        & (F.col("nc") < cfg.cols)
    )
    nb = nb.where(in_grid).join(
        cells.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"), F.col("lab").alias("nlab")
        ),
        ["nr", "nc"],
        "left",
    )
    differs = F.col("nlab").isNull() | (F.col("nlab") != F.col("lab"))
    targets = (
        nb.groupBy("row", "col", "lab")
        .agg(F.max(F.when(differs, 1).otherwise(0)).alias("bdy"))
        .where(F.col("bdy") == 1)
        .select("row", F.col("col").alias("tcol"), F.col("lab").alias("tlab"))
    )

    # phase 1: nearest target row per (grid row, target column, label)
    spark = raster.sparkSession
    tcl = targets.select("tcol", "tlab").distinct()
    rows_df = spark.range(cfg.rows).select(F.col("id").alias("row"))
    site = rows_df.crossJoin(tcl).join(
        targets.withColumn("hit", F.lit(1)), ["row", "tcol", "tlab"], "left"
    )
    w_up = (
        Window.partitionBy("tcol", "tlab")
        .orderBy("row")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_dn = (
        Window.partitionBy("tcol", "tlab")
        .orderBy(F.col("row").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_t = F.col("hit").isNotNull()
    s = site.select(
        "row",
        "tcol",
        "tlab",
        F.last(F.when(is_t, F.col("row")), ignorenulls=True).over(w_up).alias("ur"),
        F.last(F.when(is_t, F.col("row")), ignorenulls=True).over(w_dn).alias("dnr"),
    )
    take_up = F.col("ur").isNotNull() & (
        F.col("dnr").isNull()
        | ((F.col("row") - F.col("ur")) <= (F.col("dnr") - F.col("row")))
    )
    p1 = s.select(
        "row",
        "tcol",
        "tlab",
        F.when(take_up, F.col("ur")).otherwise(F.col("dnr")).alias("trow"),
    ).where(F.col("trow").isNotNull())

    schema = T.StructType(
        [
            T.StructField("row", T.LongType()),
            T.StructField("col", T.LongType()),
            T.StructField("cls", T.DoubleType()),
            T.StructField("dd", T.DoubleType()),
        ]
    )
    res_x, res_y = cfg.res_x, cfg.res_y

    def p2(key, pos_pdf: pd.DataFrame, cand_pdf: pd.DataFrame) -> pd.DataFrame:
        if pos_pdf.empty:
            return pd.DataFrame({c: [] for c in ("row", "col", "cls", "dd")})
        r = int(key[0])
        pc = pos_pdf["col"].to_numpy(dtype=np.int64)
        cc = pos_pdf["cls"].to_numpy(dtype=np.float64)
        if cand_pdf.empty:
            dd = np.full(len(pc), np.inf)
        else:
            tc = cand_pdf["tcol"].to_numpy(dtype=np.int64)
            tl = cand_pdf["tlab"].to_numpy(dtype=np.float64)
            tr = cand_pdf["trow"].to_numpy(dtype=np.int64)
            d2 = ((r - tr) * res_y) ** 2 + ((pc[:, None] - tc[None, :]) * res_x) ** 2
            d2[cc[:, None] == tl[None, :]] = np.inf
            dd = np.sqrt(d2.min(axis=1))
        return pd.DataFrame(
            {"row": np.full(len(pc), r, dtype=np.int64), "col": pc, "cls": cc, "dd": dd}
        )

    return (
        pos.groupBy("row")
        .cogroup(p1.groupBy("row"))
        .applyInPandas(p2, schema=schema)
    )


def narrowness_index(raster: DataFrame, cfg: GridConfig) -> DataFrame:
    """NarrownessIndex (gis_analysis/narrowness_index.rs, exact engine
    form): per positive class, A / (pi * MD^2) with MD = max over class
    cells of min(distance to nearest different-valued in-grid cell,
    distance to the grid edge); painted onto the class cells."""
    import math

    withd = nearest_different_distance(raster, cfg)
    edge = F.least(
        F.col("row") + 1, F.col("col") + 1,
        F.lit(cfg.rows) - F.col("row"), F.lit(cfg.cols) - F.col("col"),
    ).cast("double") * cfg.res_x
    withd = withd.select(
        "row", "col", "cls", F.least(F.col("dd"), edge).alias("d")
    )
    per = withd.groupBy("cls").agg(
        F.max("d").alias("md"), F.count(F.lit(1)).alias("n")
    )
    cell_area = cfg.res_x * cfg.res_y
    return (
        withd.join(F.broadcast(per), "cls")
        .select(
            "row", "col",
            (
                F.col("n").cast("double") * cell_area
                / (math.pi * F.col("md") * F.col("md"))
            ).alias("value"),
        )
    )


# ----------------------------------------------- overlay GEOMETRY output

_GEOM_SCHEMA = T.StructType(
    [
        T.StructField("fid_a", T.LongType()),
        T.StructField("fid_b", T.LongType()),
        T.StructField("part", T.IntegerType()),
        T.StructField("is_hole", T.BooleanType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
    ]
)


def _ring_rows(fid_a, fid_b, rings):
    """Deterministic part numbering: shells before holes, then by first
    (canonical) vertex."""
    rings = sorted(
        rings, key=lambda rh: (rh[1], rh[0][0, 0], rh[0][0, 1])
    )
    return [
        (fid_a, fid_b, i, bool(h), r[:, 0].tolist(), r[:, 1].tolist())
        for i, (r, h) in enumerate(rings)
    ]


def _pair_parts(
    layer_a: DataFrame, layer_b: DataFrame, cell, holes_a: bool, holes_b: bool = False
):
    from whitebox_tools_spark.operators.bbox_join import bbox_join

    a_side = layer_a if holes_a else layer_a.where(~F.col("is_hole"))
    a = a_side.select(
        F.col("fid").alias("fid_a"), F.col("is_hole").alias("hole_a"),
        F.col("xs").alias("xs_a"), F.col("ys").alias("ys_a"),
        F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
        F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"),
    )
    b_side = layer_b if holes_b else layer_b.where(~F.col("is_hole"))
    b = b_side.select(
        F.col("fid").alias("fid_b"), F.col("is_hole").alias("hole_b"),
        F.col("xs").alias("xs_b"), F.col("ys").alias("ys_b"),
        F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
        F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"),
    )
    return bbox_join(a, b, cell=cell).select(
        "fid_a", "hole_a", "xs_a", "ys_a", "fid_b", "hole_b", "xs_b", "ys_b"
    )


def overlay_geometry(
    layer_a: DataFrame, layer_b: DataFrame, op: str, cell: float | None = None
) -> DataFrame:
    """REAL overlay geometries (Greiner-Hormann kernel, kernels/clip.py):
    stitched rings with holes, canonical vertex order (CCW, lexicographic
    start) so results compare as plain rows.

    op='int'   -> per overlapping pair: A&B rings (A-hole ∩ B as holes);
    op='union' -> per overlapping pair: A|B rings minus A-holes outside B;
    op='diff'  -> per A feature: A minus ALL overlapping B shells
                  (fid_b null), untouched A features pass through.

    Reference contract: gis_analysis/intersect.rs:27-44 (+ :928 part
    split), union.rs, erase.rs/clip.rs — same regions, canonical ring
    encoding instead of the reference's writer-order rings. Candidate
    pairs via the grid-cell bbox equi-join; per-pair kernels run in
    Arrow-batched pandas; one extra shuffle only for the diff groupBy."""
    import numpy as np

    from whitebox_tools_spark.kernels.clip import (
        canonical,
        diff_ringset,
        gh_clip,
    )

    def _np_ring(xs, ys):
        r = np.column_stack([np.asarray(xs, float), np.asarray(ys, float)])
        if len(r) > 1 and (r[0] == r[-1]).all():
            r = r[:-1]
        return r

    if op in ("int", "union"):
        pairs = _pair_parts(layer_a, layer_b, cell, holes_a=True)

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for rec in pdf.itertuples(index=False):
                a = _np_ring(rec.xs_a, rec.ys_a)
                b = _np_ring(rec.xs_b, rec.ys_b)
                if rec.hole_a:
                    # A-hole contribution: int -> Ha&B as holes;
                    # union -> (Ha - B) as holes
                    sub = gh_clip(a, b, "int" if op == "int" else "diff")
                    rings = [(r, True) for r, h in sub if not h]
                else:
                    rings = gh_clip(a, b, op)
                rows.extend(_ring_rows(int(rec.fid_a), int(rec.fid_b), rings))
            return pd.DataFrame(
                rows, columns=[f.name for f in _GEOM_SCHEMA.fields]
            )

        return pairs.mapInPandas(
            lambda it: (run(pdf) for pdf in it), schema=_GEOM_SCHEMA
        )

    if op != "diff":
        raise ValueError(f"unknown overlay op: {op}")

    pairs = _pair_parts(layer_a, layer_b, cell, holes_a=False, holes_b=True)
    a_parts = layer_a.select(
        F.col("fid").alias("fid_a"), "is_hole", "xs", "ys"
    )
    grouped = pairs.select("fid_a", "fid_b", "hole_b", "xs_b", "ys_b").join(
        a_parts, "fid_a"
    )

    def run_diff(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["fid_a"].iloc[0])
        # B parts repeat per A part row — dedupe by vertex-tuple key,
        # keeping the owning B fid so hole add-back can exclude it
        clips, bholes = [], []
        seen = set()
        for fb, hb, xs, ys in zip(
            pdf["fid_b"], pdf["hole_b"], pdf["xs_b"], pdf["ys_b"]
        ):
            key = (bool(hb), tuple(xs), tuple(ys))
            if key not in seen:
                seen.add(key)
                (bholes if hb else clips).append((int(fb), _np_ring(xs, ys)))
        seed, a_shells, a_holes = [], [], []
        seen_p = set()
        for is_h, xs, ys in zip(pdf["is_hole"], pdf["xs"], pdf["ys"]):
            key = (bool(is_h), tuple(xs), tuple(ys))
            if key not in seen_p:
                seen_p.add(key)
                r = canonical(_np_ring(xs, ys))
                seed.append((r, bool(is_h)))
                (a_holes if is_h else a_shells).append(r)
        rings = diff_ringset(seed, [c for _, c in clips])
        # add back A & hole_b regions (a B hole is NOT part of B):
        # (shellA & Hb) shells + (holeA & Hb) holes. The pieces are
        # disjoint from the diff pieces (they live inside the hole's
        # own clipped-away shell) but ANOTHER B feature's shell may
        # still cover part of the hole, so subtract those before
        # emitting. Same-feature sibling shells are disjoint from the
        # hole's shell and can't reach it.
        for fb, hb in bholes:
            others = [c for fc, c in clips if fc != fb]
            pieces = []
            for s in a_shells:
                pieces.extend(gh_clip(s, hb, "int"))
            for h in a_holes:
                pieces.extend(
                    (r, True) for r, hh in gh_clip(h, hb, "int") if not hh
                )
            rings.extend(diff_ringset(pieces, others))
        return pd.DataFrame(
            _ring_rows(fid, None, rings),
            columns=[f.name for f in _GEOM_SCHEMA.fields],
        )

    touched = grouped.groupBy("fid_a").applyInPandas(run_diff, schema=_GEOM_SCHEMA)

    untouched = layer_a.join(
        pairs.select("fid_a").distinct(),
        layer_a.fid == F.col("fid_a"),
        "left_anti",
    )

    def run_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-feature ring renumbering with the same _ring_rows sort as
        # touched features (shells first, then canonical first vertex) —
        # a multi-part feature must not emit duplicate (fid_a, part) keys
        fid = int(pdf["fid"].iloc[0])
        rings = [
            (canonical(_np_ring(xs, ys)), bool(h))
            for h, xs, ys in zip(pdf["is_hole"], pdf["xs"], pdf["ys"])
        ]
        return pd.DataFrame(
            _ring_rows(fid, None, rings),
            columns=[f.name for f in _GEOM_SCHEMA.fields],
        )

    passthrough = (
        untouched.select("fid", "is_hole", "xs", "ys")
        .groupBy("fid")
        .applyInPandas(run_pass, schema=_GEOM_SCHEMA)
    )
    return touched.unionByName(passthrough)


def symmetrical_difference_geometry(
    layer_a: DataFrame, layer_b: DataFrame, cell: float | None = None
) -> DataFrame:
    """SymmetricalDifference geometry = (A - B) ++ (B - A) ring sets;
    fid_b carries -fid for the B-side pieces so rows stay keyed."""
    ab = overlay_geometry(layer_a, layer_b, "diff", cell)
    ba = overlay_geometry(layer_b, layer_a, "diff", cell).select(
        (-F.col("fid_a")).alias("fid_a"), "fid_b", "part", "is_hole", "xs", "ys"
    )
    return ab.unionByName(ba)
