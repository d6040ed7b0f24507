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


def cover_to_df(spark: SparkSession, polygons, res: int, bounds=cells.WORLD) -> DataFrame:
    """polygons: iterable of (poly_id, vertices ndarray). Driver-side
    cover -> small DataFrame (cell, poly_id, full) to broadcast."""
    rows = []
    for poly_id, verts in polygons:
        cell_ids, full = cells.polygon_cover(np.asarray(verts, float), res, bounds)
        for c, f in zip(cell_ids.tolist(), full.tolist()):
            rows.append((int(c), str(poly_id), bool(f)))
    return spark.createDataFrame(rows or [], "cell long, poly_id string, full boolean")


# polygons with at most this many total vertices refine via a generated
# SQL expression (whole-stage codegen, no Python); bigger ones fall back
# to the Arrow-batched numpy kernel
_PIP_EXPR_MAX_VERTS = 256


def pip_expr(px, py, poly) -> F.Column:
    """Generated-SQL ray-cast point-in-polygon predicate — the exact
    arithmetic of kernels.point_in_polygon (even-odd rule + on-edge
    tolerance, boundary counts as inside) unrolled over the driver-known
    vertex list into a codegen'd column expression. IEEE float64 ops in
    the same order as the numpy kernel => bit-identical verdicts."""
    poly = np.asarray(poly, dtype=np.float64)
    if np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    inside = F.lit(False)
    on_edge = F.lit(False)
    k = len(poly)
    for i in range(k):
        xa, ya = float(poly[i, 0]), float(poly[i, 1])
        xb, yb = float(poly[(i + 1) % k, 0]), float(poly[(i + 1) % k, 1])
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
    poly_map = {str(pid): np.asarray(v, float) for pid, v in polygons}
    cover = cover_to_df(spark, polygons, res, bounds)

    pts = with_cell(df, res, bounds, cols, "__cell")
    joined = pts.join(
        F.broadcast(cover), on=F.col("__cell") == cover["cell"], how="inner"
    ).drop("cell")

    n_verts = sum(len(v) for v in poly_map.values())
    if n_verts <= _PIP_EXPR_MAX_VERTS:
        # single-pass JVM refine: CASE over poly_id -> unrolled ray-cast
        pred = None
        for pid, verts in poly_map.items():
            hit = pip_expr(F.col(cols.x), F.col(cols.y), verts)
            branch = (F.col("poly_id") == F.lit(pid)) & hit
            pred = branch if pred is None else (pred | branch)
        return joined.filter(F.col("full") | pred).drop("full", "__cell")

    @F.pandas_udf(T.BooleanType())
    def refine(px: pd.Series, py: pd.Series, pid: pd.Series) -> pd.Series:
        out = np.zeros(len(px), dtype=bool)
        for p in pid.unique():
            m = (pid == p).to_numpy()
            out[m] = kernels.point_in_polygon(
                px.to_numpy(float)[m], py.to_numpy(float)[m], poly_map[p]
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


def knn_join(
    points: DataFrame,
    centroids: DataFrame,
    k: int = 1,
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
    centroid_cols=("cluster_id", "cx", "cy"),
) -> DataFrame:
    """J6: for each point the k nearest centroids (broadcast cross-join +
    per-point top-k). Correct for any centroid count; efficient when the
    centroid table is broadcastable (the reference's use case — cluster
    centroids). Ties broken by centroid id for determinism."""
    cid, cx, cy = centroid_cols
    cross = points.join(F.broadcast(centroids), how="cross")
    d = dist_expr(F.col(cols.x), F.col(cols.y), F.col(cx), F.col(cy), latlon)
    cross = cross.withColumn("dist", d)
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
    w = Window.partitionBy(*[F.col(c) for c in (cols.traj_id, cols.t, cols.x, cols.y)]).orderBy(
        F.col("dist").asc(), F.col(cid).asc()
    )
    out = cand.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)
    return out.withColumnRenamed("__rk", "knn_rank")


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
