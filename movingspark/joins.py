"""Distributed spatial joins (SURVEY.md §2.3 J4-J7, north rule).

Design for 100 TB / 10^12 docs:

- **Point-in-polygon** is a broadcast equi-join on the quadtree cell id:
  the polygon set is covered driver-side into (cell, poly_id, full)
  rows and broadcast; the point table is NEVER shuffled — each point
  computes its cell (pure SQL expression) and probes the broadcast map.
  Cells fully inside a polygon skip refinement; boundary cells refine
  with a vectorized numpy ray-casting pandas UDF. Hot cells therefore
  cannot skew a shuffle (there is none); downstream aggregations that
  group by cell use with_salt() for two-phase skew-safe aggregation.

- **kNN** against a small centroid/cluster table is a broadcast
  nested-loop prune: candidates are limited to the centroid cells in the
  point's neighborhood ring, falling back to brute-force broadcast
  cross-join + row_number when the centroid table is tiny.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movingspark import cells, kernels
from movingspark.derive import dist_expr
from movingspark.schema import PointCols, TRAJ_COLS


def with_cell(df: DataFrame, res: int, bounds=cells.WORLD, cols: PointCols = TRAJ_COLS, name: str = "cell") -> DataFrame:
    """Stamp the Z-order cell id (pure SQL, codegen'd)."""
    return df.withColumn(name, cells.cell_id_expr(F.col(cols.x), F.col(cols.y), res, bounds))


def with_salt(df: DataFrame, n_salt: int, name: str = "salt") -> DataFrame:
    """Uniform salt column for two-phase aggregation over skewed keys:
    groupBy(key, salt).agg(partial) -> groupBy(key).agg(final)."""
    return df.withColumn(name, (F.rand(seed=42) * n_salt).cast("int"))


def _norm_poly(verts):
    """Normalize a polygon spec to (outer_ring, holes): accepts a plain
    vertex list [(x,y),...] or a holed spec (outer, [hole_ring, ...])."""
    if (
        isinstance(verts, tuple)
        and len(verts) == 2
        and np.asarray(verts[0], dtype=object).ndim >= 2
    ):
        outer, holes = verts
        return np.asarray(outer, float), [np.asarray(h, float) for h in holes or []]
    return np.asarray(verts, float), []


def cover_to_df(spark: SparkSession, polygons, res: int, bounds=cells.WORLD) -> DataFrame:
    """polygons: iterable of (poly_id, vertices ndarray | (outer, holes)).
    Driver-side cover -> small DataFrame (cell, poly_id, full) to
    broadcast. With holes, cells whose bbox touches a hole's bbox are
    conservatively demoted from full to boundary (they refine exactly)."""
    rows = []
    for poly_id, verts in polygons:
        outer, holes = _norm_poly(verts)
        cell_ids, full = cells.polygon_cover(outer, res, bounds)
        if holes:
            cb = cells.cell_bounds_np(cell_ids, res, bounds)
            for hole in holes:
                hminx, hminy = hole.min(axis=0)
                hmaxx, hmaxy = hole.max(axis=0)
                touches = (
                    (cb[:, 0] <= hmaxx) & (cb[:, 2] >= hminx)
                    & (cb[:, 1] <= hmaxy) & (cb[:, 3] >= hminy)
                )
                full = full & ~touches
        for c, f in zip(cell_ids.tolist(), full.tolist()):
            rows.append((int(c), str(poly_id), bool(f)))
    return spark.createDataFrame(rows or [], "cell long, poly_id string, full boolean")


# polygons with at most this many total vertices refine via a generated
# SQL expression (whole-stage codegen, no Python); bigger ones fall back
# to the Arrow-batched numpy kernel
_PIP_EXPR_MAX_VERTS = 256


def _pip_ring_expr(px, py, ring) -> tuple:
    """One ring's even-odd ray cast as (inside, on_edge) codegen'd
    column expressions — exact arithmetic of kernels._ray_cast_ring."""
    ring = np.asarray(ring, dtype=np.float64)
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    inside = F.lit(False)
    on_edge = F.lit(False)
    k = len(ring)
    for i in range(k):
        xa, ya = float(ring[i, 0]), float(ring[i, 1])
        xb, yb = float(ring[(i + 1) % k, 0]), float(ring[(i + 1) % k, 1])
        cond = (F.lit(ya) > py) != (F.lit(yb) > py)
        denom = (yb - ya) if yb != ya else 1.0
        xint = F.lit(xa) + ((py - F.lit(ya)) * F.lit(xb - xa)) / F.lit(denom)
        inside = inside != (cond & (px < xint))  # boolean != == XOR
        cross = F.lit(xb - xa) * (py - F.lit(ya)) - F.lit(yb - ya) * (px - F.lit(xa))
        within = (
            (F.abs(cross) < F.lit(1e-12))
            & (px >= F.lit(min(xa, xb) - 1e-12))
            & (px <= F.lit(max(xa, xb) + 1e-12))
            & (py >= F.lit(min(ya, yb) - 1e-12))
            & (py <= F.lit(max(ya, yb) + 1e-12))
        )
        on_edge = on_edge | within
    return inside, on_edge


def pip_expr(px, py, poly, holes=None) -> F.Column:
    """Generated-SQL ray-cast point-in-polygon predicate — the exact
    arithmetic of kernels.point_in_polygon (even-odd rule + on-edge
    tolerance, boundary counts as inside) unrolled over the driver-known
    vertex list into a codegen'd column expression. IEEE float64 ops in
    the same order as the numpy kernel => bit-identical verdicts.

    holes: optional interior rings (shapely interiors) — crossing parity
    XORs over every ring, hole boundaries still count as inside."""
    inside, on_edge = _pip_ring_expr(px, py, poly)
    for hole in holes or []:
        h_in, h_edge = _pip_ring_expr(px, py, hole)
        inside = inside != h_in
        on_edge = on_edge | h_edge
    return inside | on_edge


def point_in_polygon_join(
    df: DataFrame,
    polygons,
    res: int = 8,
    bounds=cells.WORLD,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """J4+J5: inner join points -> polygons they fall in (boundary
    counts as inside, matching shapely `intersects`). `polygons` is a
    list of (poly_id, vertices). Returns input columns + poly_id.

    Plan shape: scan -> project(cell) -> BroadcastHashJoin(cover) ->
    filter(full-cell OR generated ray-cast expr). One scan, one
    broadcast join, zero Python for polygons up to _PIP_EXPR_MAX_VERTS
    total vertices; beyond that, boundary-cell rows refine through an
    Arrow-batched numpy kernel (interior cells still skip it).
    """
    spark = df.sparkSession
    poly_map = {str(pid): _norm_poly(v) for pid, v in polygons}
    cover = cover_to_df(spark, polygons, res, bounds)

    pts = with_cell(df, res, bounds, cols, "__cell")
    joined = pts.join(
        F.broadcast(cover), on=F.col("__cell") == cover["cell"], how="inner"
    ).drop("cell")

    n_verts = sum(len(outer) + sum(len(h) for h in holes) for outer, holes in poly_map.values())
    if n_verts <= _PIP_EXPR_MAX_VERTS:
        # single-pass JVM refine: CASE over poly_id -> unrolled ray-cast
        pred = None
        for pid, (outer, holes) in poly_map.items():
            hit = pip_expr(F.col(cols.x), F.col(cols.y), outer, holes)
            branch = (F.col("poly_id") == F.lit(pid)) & hit
            pred = branch if pred is None else (pred | branch)
        return joined.filter(F.col("full") | pred).drop("full", "__cell")

    @F.pandas_udf(T.BooleanType())
    def refine(px: pd.Series, py: pd.Series, pid: pd.Series) -> pd.Series:
        out = np.zeros(len(px), dtype=bool)
        for p in pid.unique():
            m = (pid == p).to_numpy()
            outer, holes = poly_map[p]
            out[m] = kernels.point_in_polygon(
                px.to_numpy(float)[m], py.to_numpy(float)[m], outer, holes
            )
        return pd.Series(out)

    # interior cells never touch Python: only boundary-cell rows pay the
    # Arrow round-trip (when() would still evaluate the UDF on all rows)
    interior = joined.filter(F.col("full")).drop("full", "__cell")
    boundary = (
        joined.filter(~F.col("full"))
        .withColumn("__ok", refine(F.col(cols.x), F.col(cols.y), F.col("poly_id")))
        .filter(F.col("__ok"))
        .drop("__ok", "full", "__cell")
    )
    return interior.unionByName(boundary)


def intersecting_traj_ids(df: DataFrame, polygon, res: int = 8, bounds=cells.WORLD, cols: PointCols = TRAJ_COLS) -> DataFrame:
    """F7/F8 point-based variant: trajectories with >= 1 point inside the
    polygon (semi-join of traj_ids)."""
    hits = point_in_polygon_join(df, [("p", polygon)], res, bounds, cols)
    return hits.select(cols.traj_id).distinct()


def seg_intersects_expr(ax, ay, bx, by, poly) -> F.Column:
    """Codegen'd predicate: segment (ax,ay)->(bx,by) intersects the
    driver-known polygon (interior or boundary — shapely `intersects`
    semantics). Endpoint-inside via the unrolled ray-cast (pip_expr) OR
    a crossing/touch of any polygon edge (orientation tests + per-pair
    bbox overlap, which rejects collinear-but-disjoint pairs). Same
    IEEE arithmetic order as kernels.segments_intersect_polygon so the
    Arrow fallback and the SQL oracle agree bit-for-bit."""
    poly = np.asarray(poly, dtype=np.float64)
    if np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    hit = pip_expr(ax, ay, poly) | pip_expr(bx, by, poly)
    k = len(poly)
    for i in range(k):
        px, py = float(poly[i, 0]), float(poly[i, 1])
        qx, qy = float(poly[(i + 1) % k, 0]), float(poly[(i + 1) % k, 1])
        d1 = (bx - ax) * (F.lit(py) - ay) - (by - ay) * (F.lit(px) - ax)
        d2 = (bx - ax) * (F.lit(qy) - ay) - (by - ay) * (F.lit(qx) - ax)
        d3 = F.lit(qx - px) * (ay - F.lit(py)) - F.lit(qy - py) * (ax - F.lit(px))
        d4 = F.lit(qx - px) * (by - F.lit(py)) - F.lit(qy - py) * (bx - F.lit(px))
        bbox = (
            (F.least(ax, bx) <= F.lit(max(px, qx)))
            & (F.greatest(ax, bx) >= F.lit(min(px, qx)))
            & (F.least(ay, by) <= F.lit(max(py, qy)))
            & (F.greatest(ay, by) >= F.lit(min(py, qy)))
        )
        hit = hit | (bbox & (d1 * d2 <= 0) & (d3 * d4 <= 0))
    return hit


def _traj_segments(df: DataFrame, cols: PointCols = TRAJ_COLS) -> DataFrame:
    """Consecutive-point segments per trajectory (__px,__py)->(x,y); the
    first point of each trajectory becomes a degenerate point-segment so
    single-point trajectories are still testable."""
    w = Window.partitionBy(cols.traj_id).orderBy(cols.t)
    return df.withColumn("__px", F.coalesce(F.lag(cols.x).over(w), F.col(cols.x))).withColumn(
        "__py", F.coalesce(F.lag(cols.y).over(w), F.col(cols.y))
    )


def intersecting_traj_ids_line(
    df: DataFrame, polygon, cols: PointCols = TRAJ_COLS
) -> DataFrame:
    """F7/F8 LINE-based semantics (reference trajectory.py:1533-1546 ->
    overlay.py:86-91): trajectories whose LineString intersects the
    polygon — a trajectory that crosses a small polygon between two
    outside observations still matches, unlike the point-based variant.

    Plan shape: one window (lag over the trajectory's own sort order —
    the partitioning every per-traj op shares) -> codegen'd bbox
    prefilter (prunes nearly all segments against the polygon's bbox,
    driver-known literals) -> codegen'd exact segment test -> distinct
    traj_ids. No Python, no extra shuffle beyond the per-traj window."""
    poly = np.asarray(polygon, dtype=np.float64)
    seg = _traj_segments(df, cols)
    minx, miny = float(poly[:, 0].min()), float(poly[:, 1].min())
    maxx, maxy = float(poly[:, 0].max()), float(poly[:, 1].max())
    x, y, px, py = F.col(cols.x), F.col(cols.y), F.col("__px"), F.col("__py")
    cand = seg.filter(
        (F.least(px, x) <= F.lit(maxx))
        & (F.greatest(px, x) >= F.lit(minx))
        & (F.least(py, y) <= F.lit(maxy))
        & (F.greatest(py, y) >= F.lit(miny))
    )
    n_verts = len(poly)
    if 2 * n_verts <= _PIP_EXPR_MAX_VERTS:
        hits = cand.filter(seg_intersects_expr(px, py, x, y, poly))
    else:
        @F.pandas_udf(T.BooleanType())
        def refine(pxs: pd.Series, pys: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
            return pd.Series(
                kernels.segments_intersect_polygon(
                    pxs.to_numpy(float), pys.to_numpy(float), xs.to_numpy(float), ys.to_numpy(float), poly
                )
            )

        hits = cand.filter(refine(px, py, x, y))
    return hits.select(cols.traj_id).distinct()


def get_intersecting(df: DataFrame, polygon, cols: PointCols = TRAJ_COLS) -> DataFrame:
    """F8: the full point rows of every trajectory whose LINE intersects
    the polygon (reference TrajectoryCollection.get_intersecting,
    trajectory_collection.py — line semantics). Broadcast semi-join of
    the (small) matching id set back onto the point table."""
    ids = intersecting_traj_ids_line(df, polygon, cols)
    return df.join(F.broadcast(ids), cols.traj_id, "left_semi")


def _nn1_agg(cross: DataFrame, point_columns, centroid_cols) -> DataFrame:
    """k=1 nearest: map-side-combinable min_by over the candidate rows.

    `groupBy(point row) + min_by(candidate, struct(dist, cid))` partially
    aggregates inside each map task, so only ~|points| rows reach the
    exchange — vs a row_number() window that sort-shuffles the full
    |points| x |candidates| product on a near-unique key. Ties broken by
    centroid id (struct ordering is lexicographic) for determinism."""
    cid, cx, cy = centroid_cols
    nn = cross.groupBy(*point_columns).agg(
        F.min_by(
            F.struct(F.col(cid), F.col(cx), F.col(cy), F.col("dist")),
            F.struct(F.col("dist"), F.col(cid)),
        ).alias("__nn")
    )
    return nn.select(
        *point_columns,
        F.col(f"__nn.{cid}").alias(cid),
        F.col(f"__nn.{cx}").alias(cx),
        F.col(f"__nn.{cy}").alias(cy),
        F.col("__nn.dist").alias("dist"),
        F.lit(1).alias("knn_rank"),
    )


def knn_join(
    points: DataFrame,
    centroids: DataFrame,
    k: int = 1,
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
    centroid_cols=("cluster_id", "cx", "cy"),
    metric: str | None = None,
) -> DataFrame:
    """J6: for each point the k nearest centroids (broadcast cross-join +
    per-point top-k). Correct for any centroid count; efficient when the
    centroid table is broadcastable (the reference's use case — cluster
    centroids). Ties broken by centroid id for determinism.

    k=1 (the reference aggregator's only use) avoids the window sort
    entirely — see `_nn1_agg`. k>1 keeps the row_number window path.

    metric="haversine" (with latlon=True) keeps the distance a pure
    codegen column expression instead of the reference-parity WGS84
    Vincenty Arrow kernel — the 100 TB shape for geographic kNN: no
    Python workers on the scoring path, argmin differences vs the
    ellipsoid only matter for points near-equidistant between two
    centroids at the ~0.3% sphere-vs-WGS84 scale."""
    cid, cx, cy = centroid_cols
    cross = points.join(F.broadcast(centroids), how="cross")
    if latlon and metric == "haversine":
        from movingspark.derive import haversine_expr

        d = haversine_expr(F.col(cols.x), F.col(cols.y), F.col(cx), F.col(cy))
    else:
        d = dist_expr(F.col(cols.x), F.col(cols.y), F.col(cx), F.col(cy), latlon)
    cross = cross.withColumn("dist", d)
    if k == 1:
        return _nn1_agg(cross, points.columns, centroid_cols)
    w = Window.partitionBy(*[F.col(c) for c in (cols.traj_id, cols.t, cols.x, cols.y)]).orderBy(
        F.col("dist").asc(), F.col(cid).asc()
    )
    out = cross.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)
    return out.withColumnRenamed("__rk", "knn_rank")


def knn_join_pruned(
    points: DataFrame,
    centroids: DataFrame,
    res: int,
    k: int = 1,
    latlon: bool = False,
    bounds=cells.WORLD,
    cols: PointCols = TRAJ_COLS,
    centroid_cols=("cluster_id", "cx", "cy"),
) -> DataFrame:
    """Scale path for kNN: centroids are replicated into their 3x3 cell
    neighborhood (still broadcast — centroid count * 9 rows), points
    probe only their own cell. Exact when the true nearest neighbor lies
    within one cell ring (cell size >= max point-centroid distance);
    callers pick `res` accordingly. Falls back to knn_join semantics
    inside the candidate set."""
    cid, cx, cy = centroid_cols
    n = 1 << res

    # replicate centroids to neighbor cells (driver-lite: stays a DataFrame)
    ix, iy = cells.cell_ixiy_expr(F.col(cx), F.col(cy), res, bounds)
    cent = centroids.withColumn("__ix", ix).withColumn("__iy", iy)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    cent = cent.withColumn("__off", F.explode(F.array(*[F.struct(F.lit(a).alias("dx"), F.lit(b).alias("dy")) for a, b in offs])))
    cent = (
        cent.withColumn("__jx", F.col("__ix") + F.col("__off.dx"))
        .withColumn("__jy", F.col("__iy") + F.col("__off.dy"))
        .filter((F.col("__jx") >= 0) & (F.col("__jx") < n) & (F.col("__jy") >= 0) & (F.col("__jy") < n))
    )
    interleave = F.lit(0).cast("long")
    for kk in range(res):
        interleave = (
            interleave
            + F.shiftleft(F.shiftright(F.col("__jx").cast("long"), kk) % 2, 2 * kk + 1)
            + F.shiftleft(F.shiftright(F.col("__jy").cast("long"), kk) % 2, 2 * kk)
        )
    cent = cent.withColumn("__cell", interleave).drop("__ix", "__iy", "__jx", "__jy", "__off")

    pts = with_cell(points, res, bounds, cols, "__cell")
    cand = pts.join(F.broadcast(cent), on="__cell", how="inner").drop("__cell")
    d = dist_expr(F.col(cols.x), F.col(cols.y), F.col(cx), F.col(cy), latlon)
    cand = cand.withColumn("dist", d)
    if k == 1:
        return _nn1_agg(cand, points.columns, centroid_cols)
    w = Window.partitionBy(*[F.col(c) for c in (cols.traj_id, cols.t, cols.x, cols.y)]).orderBy(
        F.col("dist").asc(), F.col(cid).asc()
    )
    out = cand.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)
    return out.withColumnRenamed("__rk", "knn_rank")


def tile_rollup_median(
    df: DataFrame,
    res: int,
    value_col: str = "value",
    bounds=cells.WORLD,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Exact per-cell median via value-histogram composition — the
    skew-aware formulation of a proportional-state aggregate.

    percentile()-style exact medians buffer EVERY group value in the
    aggregation buffer, so partial aggregation ships the full value
    multiset and a hot cell concentrates its entire row mass on one
    reducer (the one rollup shape map-side combine does NOT protect;
    counts/sums/count-distinct all pre-merge and are structurally
    skew-immune — measured in tools/bench_skew.py). Composing through
    the (cell, value) histogram instead diffuses the hot cell across
    reducers: groupBy(cell, value).count() partial-merges map-side, the
    per-cell cumulative walk then touches at most |distinct values|
    rows per cell. Interpolation follows percentile() semantics exactly
    (rank = 0.5*(n-1); linear between the two straddling order stats),
    so the result matches percentile(value_col, 0.5) bit-for-bit when
    values and counts are exactly representable."""
    from pyspark.sql import Window

    tagged = with_cell(df, res, bounds, cols, "cell")
    hist = tagged.groupBy("cell", F.col(value_col).alias("__v")).agg(
        F.count("*").alias("__c")
    )
    w_cum = (
        Window.partitionBy("cell")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_cell = Window.partitionBy("cell")
    n = F.sum("__c").over(w_cell)
    rank = (n - F.lit(1)).cast("double") * 0.5
    lo = F.floor(rank)
    hi = F.ceil(rank)
    cum = F.sum("__c").over(w_cum)
    staged = hist.select(
        "cell",
        "__v",
        cum.alias("__cum"),
        rank.alias("__rank"),
        lo.alias("__lo"),
        hi.alias("__hi"),
    )
    agg = staged.groupBy("cell").agg(
        F.min(F.when(F.col("__cum") > F.col("__lo"), F.col("__v"))).alias("__vlo"),
        F.min(F.when(F.col("__cum") > F.col("__hi"), F.col("__v"))).alias("__vhi"),
        F.first("__rank").alias("__r"),
        F.first("__lo").alias("__l"),
    )
    return agg.select(
        "cell",
        (
            F.col("__vlo")
            + (F.col("__vhi") - F.col("__vlo")) * (F.col("__r") - F.col("__l"))
        ).alias("median_value"),
    )


def tile_rollup(
    df: DataFrame,
    res: int,
    value_col: str | None = None,
    bounds=cells.WORLD,
    n_salt: int = 0,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Raster<->vector tile rollup: per-cell counts (+ optional value
    aggregates) at resolution `res`. With n_salt > 0 the aggregation runs
    two-phase (salted partial then final) so one hot tile cannot skew a
    reducer — the north rule's explicit skew handling for tiling."""
    tagged = with_cell(df, res, bounds, cols, "cell")
    aggs = [F.count("*").alias("n_points"), F.count_distinct(cols.traj_id).alias("n_trajs")]
    if value_col:
        aggs += [F.sum(value_col).alias("sum_value")]
    if n_salt <= 0:
        return tagged.groupBy("cell").agg(*aggs)
    salted = with_salt(tagged, n_salt)
    # counts roll up two-phase; exact distinct goes through a dedup first
    # (dedup shuffles on (cell, traj_id) — already skew-diffused)
    partial = salted.groupBy("cell", "salt").agg(
        F.count("*").alias("__pn"), *( [F.sum(value_col).alias("__pv")] if value_col else [] )
    )
    final_aggs = [F.sum("__pn").alias("n_points")]
    if value_col:
        final_aggs += [F.sum("__pv").alias("sum_value")]
    counts = partial.groupBy("cell").agg(*final_aggs)
    distincts = (
        tagged.select("cell", cols.traj_id)
        .distinct()
        .groupBy("cell")
        .agg(F.count("*").alias("n_trajs"))
    )
    return counts.join(distincts, "cell", "left")


def tile_rollup_multires(
    df: DataFrame,
    res_fine: int,
    res_coarse: int,
    value_col: str | None = None,
    bounds=cells.WORLD,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Hierarchical tile rollup: materialize the fine-resolution rollup
    ONCE, then derive every coarser level by re-aggregating cell ids
    (parent = cell >> 2 per level, cells.parent_cell_expr) — the
    hypertable / continuous-aggregate pattern. At 100 TB the point
    table is scanned exactly once regardless of how many zoom levels a
    tile service needs; each coarser level aggregates <= 4^res_fine
    rows, so levels are effectively free after the first.

    Output: one row per (res, cell) for both levels, with n_points
    (+ sum_value) — counts are exactly additive under the parent
    relation, which the oracle verifies against a direct coarse rollup
    of the raw points. (Distinct-trajectory counts are NOT additive and
    intentionally absent here; use tile_rollup per level when those are
    needed.)"""
    if res_coarse >= res_fine:
        raise ValueError("res_coarse must be coarser (smaller) than res_fine")
    tagged = with_cell(df, res_fine, bounds, cols, "cell")
    aggs = [F.count("*").alias("n_points")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    fine = tagged.groupBy("cell").agg(*aggs)
    coarse_aggs = [F.sum("n_points").alias("n_points")]
    if value_col:
        coarse_aggs.append(F.sum("sum_value").alias("sum_value"))
    coarse = (
        fine.groupBy(
            cells.parent_cell_expr(F.col("cell"), res_fine - res_coarse).alias("cell")
        )
        .agg(*coarse_aggs)
    )
    lit_f, lit_c = F.lit(int(res_fine)), F.lit(int(res_coarse))
    return fine.select(lit_f.alias("res"), "cell", *[c for c in fine.columns if c != "cell"]).unionByName(
        coarse.select(lit_c.alias("res"), "cell", *[c for c in coarse.columns if c != "cell"])
    )


def tile_dwell(
    df: DataFrame,
    res: int,
    bounds=cells.WORLD,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Time-weighted tile occupancy: each consecutive segment's duration
    is allocated to the cell of its START observation, so a cell's
    `dwell_s` approximates total time spent in it rather than sample
    count — the heatmap that stays correct under irregular sampling
    (tile_rollup over-counts wherever the sampler runs fast). Exact
    boundary-split allocation is the overlay-clip path; this is the
    standard first-order approximation used when segments are short
    relative to cells.

    Plan: one per-trajectory window (lead) for segment durations —
    reusing the canonical traj_id exchange — then a map-side-combinable
    two-column rollup per cell. Final observations have no successor
    and contribute no time (they end the trajectory)."""
    w = Window.partitionBy(cols.traj_id).orderBy(cols.t)
    # sum MICROSECONDS (exact integers, order-free) and divide once at
    # the end: a float sum's value depends on partial-agg association,
    # which differs between engines and between runs.
    dt_us = F.unix_micros(F.lead(cols.t).over(w)) - F.unix_micros(F.col(cols.t))
    tagged = with_cell(df, res, bounds, cols, "cell").withColumn("__dt", dt_us)
    return (
        tagged.filter(F.col("__dt").isNotNull())
        .groupBy("cell")
        .agg(
            (F.sum("__dt").cast("double") / F.lit(1e6)).alias("dwell_s"),
            F.count(F.lit(1)).alias("n_segments"),
        )
    )


def cell_visits(
    df: DataFrame,
    res: int,
    bounds=cells.WORLD,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Cell-visit segmentation: consecutive observations in the same
    tile cell collapse into one VISIT row (traj_id, cell, visit number,
    enter/leave time, duration, point count) — the tile-granular dwell
    ledger behind "how long did each vehicle stay in each zone", and
    the all-cells generalization of the single-fence geofence events.
    Re-entering a cell later opens a NEW visit (visits are temporal
    runs, not distinct-cell rollups).

    One trajectory window (lag + running sum over the same sort) and a
    map-side-combinable group — the standard single-exchange shape;
    duration sums integer microseconds (exact, order-free) and divides
    once."""
    w = Window.partitionBy(cols.traj_id).orderBy(cols.t)
    tagged = with_cell(df, res, bounds, cols, "cell")
    new_visit = F.when(
        F.lag("cell").over(w).isNull() | (F.lag("cell").over(w) != F.col("cell")),
        F.lit(1),
    ).otherwise(F.lit(0))
    visits = tagged.withColumn(
        "visit",
        F.sum(new_visit).over(
            Window.partitionBy(cols.traj_id)
            .orderBy(cols.t)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    t_us = F.unix_micros(F.col(cols.t))
    return visits.groupBy(cols.traj_id, "visit").agg(
        F.first("cell").alias("cell"),
        F.min(cols.t).alias("enter_t"),
        F.max(cols.t).alias("leave_t"),
        ((F.max(t_us) - F.min(t_us)).cast("double") / F.lit(1e6)).alias("duration_s"),
        F.count(F.lit(1)).alias("n_points"),
    )
