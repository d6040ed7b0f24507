"""Raster -> vector conversion over the quadtree tile grid.

`joins.tile_rollup` is the vector -> raster half of the north rule's
"raster<->vector tile rollups"; this module is the other direction:

- `vectorize_tiles`: every occupied cell becomes a vector feature —
  cell id, WKT POLYGON of the cell rectangle, point/trajectory counts
  (and optional value sum). The classic "raster as polygons" export.
- `raster_regions`: threshold the raster, then dissolve 4-adjacent
  surviving cells into connected REGIONS (the raster analogue of GDAL
  polygonize / "contour islands"), labeling each region with the
  minimum member cell id via the same distributed large-star/small-star
  connected components that powers dedup clustering
  (movingspark/components.py).

Scale shape (the reason this is not a Pandas UDF): the only pass over
the POINT table is the tile rollup itself — a map-side-combinable
count/sum aggregation identical to `tile_rollup`. Everything after
(adjacency join, connected components, region aggregation) runs on the
RASTER, whose row count is bounded by the occupied-cell count
(<= 4^res, independent of the input size), so at 10^12 points the
raster->vector stage costs the same as at 10^6. Adjacency is an
equi-join on the (ix, iy) composite key — no geometry predicates, no
cross product; CC rounds are O(log^2 #cells).

No counterpart in the reference (movingpandas has no raster layer);
this extends the aggregation surface (SURVEY §2.12) the same way
TrajectoryCollectionAggregator's grid flows (reference
trajectory_aggregator.py:141-233) motivated `aggregate.flows`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movingspark import cells
from movingspark.components import connected_components
from movingspark.joins import TRAJ_COLS, PointCols

__all__ = ["rasterize", "vectorize_tiles", "raster_regions"]


def rasterize(
    df: DataFrame,
    res: int,
    bounds=cells.WORLD,
    value_col: str | None = None,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Point table -> raster keyed by grid coords: (ix, iy, cell,
    n_points, n_trajs[, sum_value]). Same single map-side-combinable
    aggregation as `joins.tile_rollup`, but keeps (ix, iy) alongside the
    Morton cell id so downstream adjacency needs no bit de-interleave."""
    ix, iy = cells.cell_ixiy_expr(F.col(cols.x), F.col(cols.y), res, bounds)
    aggs = [
        F.count("*").alias("n_points"),
        F.count_distinct(cols.traj_id).alias("n_trajs"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        df.withColumn("ix", ix)
        .withColumn("iy", iy)
        .withColumn("cell", cells.interleave_expr(F.col("ix"), F.col("iy"), res))
        .groupBy("ix", "iy", "cell")
        .agg(*aggs)
    )


def _cell_rect(ix: Column, iy: Column, res: int, bounds) -> tuple[Column, ...]:
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    cw, ch = (maxx - minx) / n, (maxy - miny) / n
    x0 = F.lit(float(minx)) + ix * F.lit(cw)
    y0 = F.lit(float(miny)) + iy * F.lit(ch)
    return x0, y0, x0 + F.lit(cw), y0 + F.lit(ch)


def vectorize_tiles(
    df: DataFrame,
    res: int,
    bounds=cells.WORLD,
    value_col: str | None = None,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Raster -> vector polygons: one row per occupied cell with the
    cell rectangle as WKT POLYGON (CCW from SW corner, closed ring) and
    the per-cell aggregates. Pure codegen expressions after the rollup —
    the WKT is a format_string, not a geometry library call."""
    ras = rasterize(df, res, bounds, value_col, cols)
    x0, y0, x1, y1 = _cell_rect(F.col("ix"), F.col("iy"), res, bounds)
    wkt = F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f))",
        x0, y0, x1, y0, x1, y1, x0, y1, x0, y0,
    )
    keep = ["n_points", "n_trajs"] + (["sum_value"] if value_col else [])
    return ras.select("cell", wkt.alias("wkt"), *keep)


def raster_regions(
    df: DataFrame,
    res: int,
    min_points: int,
    bounds=cells.WORLD,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Raster -> vector regionization: cells with >= `min_points` points
    are dissolved with their 4-adjacent neighbors into connected
    regions. Output, one row per region:

      region_id  = minimum Morton cell id in the region (deterministic),
      n_cells    = member cell count,
      n_points   = points covered,
      x_min/y_min/x_max/y_max = region bounding box in data coords
                   (union of member cell rectangles).

    The adjacency graph is built by two equi-joins of the thresholded
    raster with itself on (ix+1, iy) and (ix, iy+1) — each surviving
    cell meets each of its east/north neighbors exactly once — then
    labeled by `components.connected_components`. Isolated cells (no
    surviving neighbor) never appear in the edge list and fall back to
    their own cell id as region label."""
    ras = rasterize(df, res, bounds, None, cols).filter(
        F.col("n_points") >= F.lit(int(min_points))
    )
    # the raster is tiny relative to the points and reused three times
    # (two adjacency probes + the label join): cache it.
    ras = ras.persist()
    a = ras.select("ix", "iy", "cell")

    def adj(dx: int, dy: int) -> DataFrame:
        return (
            a.alias("l")
            .join(
                a.alias("r"),
                (F.col("l.ix") + dx == F.col("r.ix"))
                & (F.col("l.iy") + dy == F.col("r.iy")),
            )
            .select(F.col("l.cell").alias("src"), F.col("r.cell").alias("dst"))
        )

    edges = adj(1, 0).unionByName(adj(0, 1))
    comp = connected_components(edges, src="src", dst="dst")
    lab = ras.join(comp, ras["cell"] == comp["node"], "left").select(
        ras["ix"], ras["iy"], ras["n_points"],
        F.coalesce(comp["component"], ras["cell"]).alias("region_id"),
    )
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    cw, ch = (maxx - minx) / n, (maxy - miny) / n
    out = lab.groupBy("region_id").agg(
        F.count("*").alias("n_cells"),
        F.sum("n_points").alias("n_points"),
        (F.lit(float(minx)) + F.min("ix") * F.lit(cw)).alias("x_min"),
        (F.lit(float(miny)) + F.min("iy") * F.lit(ch)).alias("y_min"),
        (F.lit(float(minx)) + (F.max("ix") + 1) * F.lit(cw)).alias("x_max"),
        (F.lit(float(miny)) + (F.max("iy") + 1) * F.lit(ch)).alias("y_max"),
    )
    return out
