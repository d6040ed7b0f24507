"""Trajectory-pair geometry ops (SURVEY.md §2: Trajectory.distance /
hausdorff_distance as DataFrame operators).

Reference: trajectory.py:1548-1586 (distance = shapely
LineString.distance, min line-line distance, 0 on intersection) and
trajectory.py:1587-1627 (hausdorff_distance = GEOS discrete Hausdorff,
vertex-to-line). Tests: test_trajectory.py:1130-1176.

Scale shape: each trajectory is folded to one row of coordinate arrays
with a map-side-combinable collect_list (trajectories are bounded-size
groups by construction); the pair table joins against that folded table
twice — broadcast when the pair list is small — and a struct-returning
Arrow-batched pandas UDF computes both metrics per pair. The point-table
never ships twice and nothing is quadratic in points.

`distance_to_point` needs no Python at all: consecutive-point segments
via the per-trajectory lag window, a codegen'd clamp-projection distance
expression, then a map-side-combinable min per trajectory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from movingspark import kernels
from movingspark.schema import PointCols, TRAJ_COLS


def _traj_coords(df: DataFrame, cols: PointCols, key: str) -> DataFrame:
    """Fold each trajectory to one row: (key, xs array, ys array), in
    time order (array_sort on (t,x,y) structs — t first => time order)."""
    return (
        df.groupBy(F.col(cols.traj_id).alias(key))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(cols.t), F.col(cols.x), F.col(cols.y)))
            ).alias("__s")
        )
        .select(
            key,
            F.col(f"__s.{cols.x}").alias(f"__{key}_xs"),
            F.col(f"__s.{cols.y}").alias(f"__{key}_ys"),
        )
    )


def trajectory_pair_metrics(
    df: DataFrame,
    pairs,
    cols: PointCols = TRAJ_COLS,
    broadcast_pairs: bool = True,
) -> DataFrame:
    """min line-line distance + discrete Hausdorff for every (traj_a,
    traj_b) pair. `pairs`: DataFrame with columns (traj_a, traj_b) or a
    list of id tuples. Output: (traj_a, traj_b, min_distance, hausdorff)."""
    spark = df.sparkSession
    if not isinstance(pairs, DataFrame):
        pairs = spark.createDataFrame(
            [(str(a), str(b)) for a, b in pairs], "traj_a string, traj_b string"
        )
    a = _traj_coords(df, cols, "traj_a")
    b = _traj_coords(df, cols, "traj_b")
    p = F.broadcast(pairs) if broadcast_pairs else pairs
    j = a.join(p, "traj_a").join(b, "traj_b")

    @F.pandas_udf("min_distance double, hausdorff double")
    def metrics(xa: pd.Series, ya: pd.Series, xb: pd.Series, yb: pd.Series) -> pd.DataFrame:
        mins, hds = [], []
        for i in range(len(xa)):
            la = np.column_stack([np.asarray(xa[i], float), np.asarray(ya[i], float)])
            lb = np.column_stack([np.asarray(xb[i], float), np.asarray(yb[i], float)])
            mins.append(kernels.polyline_min_distance(la, lb))
            hds.append(kernels.discrete_hausdorff_line(la, lb))
        return pd.DataFrame({"min_distance": mins, "hausdorff": hds})

    return j.select(
        "traj_a",
        "traj_b",
        metrics(
            F.col("__traj_a_xs"), F.col("__traj_a_ys"), F.col("__traj_b_xs"), F.col("__traj_b_ys")
        ).alias("__m"),
    ).select(
        "traj_a",
        "traj_b",
        F.col("__m.min_distance").alias("min_distance"),
        F.col("__m.hausdorff").alias("hausdorff"),
    )


def trajectory_to_line_metrics(
    df: DataFrame, line, cols: PointCols = TRAJ_COLS
) -> DataFrame:
    """Per-trajectory min distance + discrete Hausdorff against ONE
    driver-known polyline/point (reference: traj.distance(geometry),
    traj.hausdorff_distance(geometry)). Output: (traj_id, min_distance,
    hausdorff)."""
    line_np = np.asarray(line, dtype=np.float64)
    if line_np.ndim == 1:
        line_np = line_np.reshape(1, 2)
    a = _traj_coords(df, cols, cols.traj_id)

    @F.pandas_udf("min_distance double, hausdorff double")
    def metrics(xa: pd.Series, ya: pd.Series) -> pd.DataFrame:
        mins, hds = [], []
        for i in range(len(xa)):
            la = np.column_stack([np.asarray(xa[i], float), np.asarray(ya[i], float)])
            mins.append(kernels.polyline_min_distance(la, line_np))
            hds.append(kernels.discrete_hausdorff_line(la, line_np))
        return pd.DataFrame({"min_distance": mins, "hausdorff": hds})

    k = cols.traj_id
    return a.select(
        k, metrics(F.col(f"__{k}_xs"), F.col(f"__{k}_ys")).alias("__m")
    ).select(
        k,
        F.col("__m.min_distance").alias("min_distance"),
        F.col("__m.hausdorff").alias("hausdorff"),
    )


def point_segment_dist_expr(qx: float, qy: float, ax, ay, bx, by) -> F.Column:
    """Codegen'd distance from the fixed point (qx,qy) to segment a->b:
    same clamp-projection arithmetic as kernels.point_segment_dist, so
    the SQL oracle (identical formula) agrees bit-for-bit."""
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t_raw = ((F.lit(qx) - ax) * dx + (F.lit(qy) - ay) * dy) / F.when(len2 == 0, F.lit(1.0)).otherwise(len2)
    t = F.least(F.greatest(F.when(len2 > 0, t_raw).otherwise(F.lit(0.0)), F.lit(0.0)), F.lit(1.0))
    cx, cy = ax + t * dx, ay + t * dy
    return F.sqrt((F.lit(qx) - cx) * (F.lit(qx) - cx) + (F.lit(qy) - cy) * (F.lit(qy) - cy))


def distance_to_point(df: DataFrame, qx: float, qy: float, cols: PointCols = TRAJ_COLS) -> DataFrame:
    """Per-trajectory min distance from the trajectory LINE to a fixed
    point — measure_distance_line parity (geometry_utils.py:102-107)
    without Python: lag window -> codegen'd point-segment distance ->
    map-side-combinable min per trajectory."""
    w = Window.partitionBy(cols.traj_id).orderBy(cols.t)
    seg = df.withColumn("__px", F.lag(cols.x).over(w)).withColumn("__py", F.lag(cols.y).over(w))
    # first row per traj: degenerate segment (point distance)
    ax = F.coalesce(F.col("__px"), F.col(cols.x))
    ay = F.coalesce(F.col("__py"), F.col(cols.y))
    d = point_segment_dist_expr(qx, qy, ax, ay, F.col(cols.x), F.col(cols.y))
    return seg.withColumn("__d", d).groupBy(cols.traj_id).agg(F.min("__d").alias("min_distance"))


def hausdorff_to_polyline(
    df: DataFrame, polyline: list[tuple[float, float]], cols: PointCols = TRAJ_COLS
) -> DataFrame:
    """Directed discrete Hausdorff from each trajectory's POINTS to a
    fixed query polyline: max over the trajectory's points of the min
    distance to any polyline segment — the similarity-search primitive
    "rank all trajectories by how far they stray from this route".

    Pure codegen: the polyline is a handful of driver-known segments,
    so per point the distance is a LEAST() over a few clamp-projection
    expressions (same arithmetic as point_segment_dist_expr with the
    roles swapped — point is a column, segment is constant), then one
    map-side-combinable MAX per trajectory. No Python, no join, no
    second shuffle: at 100 TB this is a single scan + one partial agg."""
    x, y = F.col(cols.x), F.col(cols.y)
    dists = []
    for (ax, ay), (bx, by) in zip(polyline, polyline[1:]):
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        if len2 == 0:
            dists.append(F.sqrt((x - ax) * (x - ax) + (y - ay) * (y - ay)))
            continue
        t_raw = ((x - ax) * dx + (y - ay) * dy) / F.lit(len2)
        t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
        cx, cy = F.lit(ax) + t * dx, F.lit(ay) + t * dy
        dists.append(F.sqrt((x - cx) * (x - cx) + (y - cy) * (y - cy)))
    d = F.least(*dists) if len(dists) > 1 else dists[0]
    return (
        df.withColumn("__d", d)
        .groupBy(cols.traj_id)
        .agg(F.max("__d").alias("hausdorff"))
    )


def frechet_to_polyline(
    df: DataFrame, polyline: list[tuple[float, float]], cols: PointCols = TRAJ_COLS
) -> DataFrame:
    """Discrete Fréchet distance (Eiter & Mannila 1994 coupling DP) from
    each trajectory's time-ordered points to a fixed query route — the
    order-aware route-similarity metric Hausdorff lacks (a trajectory
    that traces the route BACKWARDS scores 0 on Hausdorff but large on
    Fréchet). Output: (traj_id, frechet).

    The O(n*m) DP runs as a PURE CATALYST fold — zero Python: each
    trajectory folds to its sorted coordinate arrays (one exchange, the
    same map-side-combinable collect as every pair metric here), then
    F.aggregate() walks the points carrying the m-wide DP row as a
    struct, with the column recurrence

        new[0] = max(d(p, 0), acc[0])
        new[j] = max(d(p, j), min(acc[j], acc[j-1], new[j-1]))

    unrolled over the route's m vertices. Unrolling duplicates the
    new[j-1] subtree, so expression size is O(2^m): fine for the short
    query routes this op is for (m <= ~10); longer routes belong in the
    pandas-UDF pair kernel above. Per trajectory the fold is linear and
    the whole op is scan -> partial agg -> fold: no join, nothing
    quadratic in points, skew bounded by trajectory length."""
    m = len(polyline)
    if m < 1:
        raise ValueError("polyline needs at least one vertex")
    k = cols.traj_id
    a = _traj_coords(df, cols, k)
    xs, ys = f"__{k}_xs", f"__{k}_ys"
    pts = F.arrays_zip(F.col(xs), F.col(ys))

    def d(p, j):
        qx, qy = polyline[j]
        dx, dy = p[xs] - F.lit(float(qx)), p[ys] - F.lit(float(qy))
        return F.sqrt(dx * dx + dy * dy)

    def init_state(p):
        c = [d(p, 0)]
        for j in range(1, m):
            c.append(F.greatest(c[j - 1], d(p, j)))
        return F.struct(*[cj.alias(f"c{j}") for j, cj in enumerate(c)])

    def step(acc, p):
        new = [F.greatest(d(p, 0), acc["c0"])]
        for j in range(1, m):
            new.append(
                F.greatest(
                    d(p, j),
                    F.least(acc[f"c{j}"], acc[f"c{j-1}"], new[j - 1]),
                )
            )
        return F.struct(*[nj.alias(f"c{j}") for j, nj in enumerate(new)])

    rest = F.slice(pts, F.lit(2), F.greatest(F.size(pts) - F.lit(1), F.lit(0)))
    out = F.aggregate(rest, init_state(pts[0]), step, lambda acc: acc[f"c{m-1}"])
    return a.select(k, out.alias("frechet"))


def route_progress(
    df: DataFrame, polyline: list[tuple[float, float]], cols: PointCols = TRAJ_COLS
) -> DataFrame:
    """Linear referencing (map-matching-lite): snap every observation to
    a driver-known route polyline and report `route_offset` (distance
    along the route from its start to the snapped point) and
    `route_dist` (snap error, the perpendicular distance). The
    progress-along-route view is what turns raw fixes into "vehicle is
    at km 14.2 of the corridor" — the primitive under ETA, headway and
    corridor-occupancy queries.

    Pure codegen, zero Python, zero shuffle: per segment the clamp
    projection is the same arithmetic as hausdorff_to_polyline, the
    argmin over the route's m segments is an unrolled strictly-less
    CASE fold (ties keep the EARLIEST segment — deterministic and
    mirrored by the SQL oracle), and the cumulative segment offsets
    fold in as plan-time literals. One scan at any scale."""
    import math

    x, y = F.col(cols.x), F.col(cols.y)
    if len(polyline) < 2:
        raise ValueError("route needs at least 2 vertices")
    best_d, best_off = None, None
    cum = 0.0
    for (ax, ay), (bx, by) in zip(polyline, polyline[1:]):
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        seg_len = math.sqrt(len2)
        if len2 == 0:
            d = F.sqrt((x - ax) * (x - ax) + (y - ay) * (y - ay))
            off = F.lit(cum)
        else:
            t_raw = ((x - ax) * dx + (y - ay) * dy) / F.lit(len2)
            t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
            cx, cy = F.lit(ax) + t * dx, F.lit(ay) + t * dy
            d = F.sqrt((x - cx) * (x - cx) + (y - cy) * (y - cy))
            off = F.lit(cum) + t * F.lit(seg_len)
        if best_d is None:
            best_d, best_off = d, off
        else:
            closer = d < best_d
            best_off = F.when(closer, off).otherwise(best_off)
            best_d = F.when(closer, d).otherwise(best_d)
        cum += seg_len
    return df.select(
        cols.traj_id,
        cols.t,
        best_off.alias("route_offset"),
        best_d.alias("route_dist"),
    )
