"""Native hierarchical cell index (H3/S2-style, SURVEY.md §4.1).

The environment has no h3/s2 library, so the engine uses a quadtree
cell scheme over a configurable bounding box (default: lon/lat world):
at resolution r the domain is a 2^r x 2^r grid and a cell id is the
Morton (Z-order) interleave of (ix, iy) plus the resolution in the high
bits. Properties used by the join layer:

- pure arithmetic -> computable as a Spark SQL column expression
  (JVM-side, codegen, pushdown-friendly) AND as ANSI SQL for the
  DuckDB oracle AND in numpy for driver-side polygon covers;
- Z-order keys cluster spatially close cells -> range partitioning on
  cell id gives spatial locality (tile rollups, Iceberg sort orders);
- parent cell = child id with the low 2 bits of the interleave dropped
  (hierarchical rollup for raster<->vector tiling).

This replaces the reference's R-tree candidate filter
(overlay.py:171-188) with a distributed-friendly equi-join key.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from movingspark import kernels

WORLD = (-180.0, -90.0, 180.0, 90.0)  # minx, miny, maxx, maxy


def _interleave_bits_np(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Morton interleave: bit k of ix -> bit 2k+1, of iy -> bit 2k."""
    out = np.zeros_like(ix, dtype=np.int64)
    for k in range(res):
        out |= ((ix >> k) & 1) << (2 * k + 1)
        out |= ((iy >> k) & 1) << (2 * k)
    return out


def cell_id_np(x: np.ndarray, y: np.ndarray, res: int, bounds=WORLD) -> np.ndarray:
    """Z-order cell id in numpy (for covers & kernels)."""
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    ix = np.clip(((np.asarray(x, float) - minx) / (maxx - minx) * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((np.asarray(y, float) - miny) / (maxy - miny) * n).astype(np.int64), 0, n - 1)
    return _interleave_bits_np(ix, iy, res)


def cell_ixiy_expr(x: Column, y: Column, res: int, bounds=WORLD):
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    ix = F.least(
        F.greatest(F.floor((x - F.lit(float(minx))) / F.lit(maxx - minx) * n), F.lit(0)),
        F.lit(n - 1),
    )
    iy = F.least(
        F.greatest(F.floor((y - F.lit(float(miny))) / F.lit(maxy - miny) * n), F.lit(0)),
        F.lit(n - 1),
    )
    return ix.cast("long"), iy.cast("long")


def interleave_expr(ix: Column, iy: Column, res: int) -> Column:
    """Morton interleave of integer grid coords as a Spark expression
    (bit k of ix -> 2k+1, of iy -> 2k; lock-step with
    _interleave_bits_np and interleave_sql)."""
    out = F.lit(0).cast("long")
    for k in range(res):
        out = (
            out
            + F.shiftleft(F.shiftright(ix, k) % 2, 2 * k + 1)
            + F.shiftleft(F.shiftright(iy, k) % 2, 2 * k)
        )
    return out


def interleave_sql(ix: str, iy: str, res: int) -> str:
    """Morton interleave of integer grid-coord SQL expressions (DuckDB
    oracle twin of interleave_expr)."""
    terms = []
    for k in range(res):
        terms.append(f"((({ix}) >> {k}) % 2) * {1 << (2 * k + 1)}")
        terms.append(f"((({iy}) >> {k}) % 2) * {1 << (2 * k)}")
    return "(" + " + ".join(terms) + ")"


def cell_ixiy_sql(x: str, y: str, res: int, bounds=WORLD) -> tuple[str, str]:
    """(ix, iy) grid coords as ANSI SQL strings (DuckDB oracle twin of
    cell_ixiy_expr)."""
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    ix = f"LEAST(GREATEST(CAST(FLOOR(({x} - ({minx})) / {maxx - minx} * {n}) AS BIGINT), 0), {n - 1})"
    iy = f"LEAST(GREATEST(CAST(FLOOR(({y} - ({miny})) / {maxy - miny} * {n}) AS BIGINT), 0), {n - 1})"
    return ix, iy


def cell_id_expr(x: Column, y: Column, res: int, bounds=WORLD) -> Column:
    """Z-order cell id as a pure Spark SQL expression (no UDF).

    The result is wrapped in coalesce(..., -1) to make the column
    NON-NULLABLE. This is load-bearing for performance, not cosmetics:
    when the cell id is a join key, Catalyst's constraint inference adds
    isnotnull(<whole interleave expression>) and pushes it below the
    upstream projections, inlining every x/y reference — for parsed
    sources that re-evaluated split()+parseDouble 12x per row (measured
    5x slowdown of the doc spatial join). A non-nullable key produces no
    isnotnull constraint at all. Values are unchanged: the interleave is
    only null when x or y is null, which the -1 sentinel maps outside
    every valid cover cell (cover ids are >= 0), so joins/rollups treat
    malformed rows as no-match either way."""
    ix, iy = cell_ixiy_expr(x, y, res, bounds)
    return F.coalesce(interleave_expr(ix, iy, res), F.lit(-1).cast("long"))


def cell_id_sql(x: str, y: str, res: int, bounds=WORLD) -> str:
    """Same cell id as ANSI SQL (DuckDB oracle). Kept in lock-step with
    cell_id_expr — both are pure integer arithmetic."""
    ix, iy = cell_ixiy_sql(x, y, res, bounds)
    # COALESCE(-1) mirrors cell_id_expr's null->-1 sentinel so engine and
    # oracle stay in lock-step on null coordinates.
    return f"COALESCE({interleave_sql(ix, iy, res)}, -1)"


def parent_cell_expr(cell: Column, levels: int = 1) -> Column:
    """Hierarchical rollup: drop the lowest 2*levels interleave bits."""
    return F.shiftright(cell, 2 * levels)


def cell_bounds_np(cell_ids: np.ndarray, res: int, bounds=WORLD) -> np.ndarray:
    """(minx, miny, maxx, maxy) per cell id — numpy, for covers/tests."""
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    cell_ids = np.asarray(cell_ids, dtype=np.int64)
    ix = np.zeros_like(cell_ids)
    iy = np.zeros_like(cell_ids)
    for k in range(res):
        ix |= ((cell_ids >> (2 * k + 1)) & 1) << k
        iy |= ((cell_ids >> (2 * k)) & 1) << k
    w = (maxx - minx) / n
    h = (maxy - miny) / n
    x0 = minx + ix * w
    y0 = miny + iy * h
    return np.column_stack([x0, y0, x0 + w, y0 + h])


def polygon_cover(poly: np.ndarray, res: int, bounds=WORLD):
    """Driver-side polygon -> covering cells at resolution `res`.

    Returns (cells, full) where `full[i]` marks cells entirely inside the
    polygon (points there skip the exact point-in-polygon refinement —
    the standard two-list spatial-join cover). Cost is O(cells in bbox);
    choose res so the polygon spans a sane number of cells.
    """
    poly = np.asarray(poly, dtype=np.float64)
    if np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    w = (maxx - minx) / n
    h = (maxy - miny) / n
    pminx, pminy = poly.min(axis=0)
    pmaxx, pmaxy = poly.max(axis=0)
    ix0 = max(0, min(n - 1, int((pminx - minx) // w)))
    ix1 = max(0, min(n - 1, int((pmaxx - minx) // w)))
    iy0 = max(0, min(n - 1, int((pminy - miny) // h)))
    iy1 = max(0, min(n - 1, int((pmaxy - miny) // h)))

    cells = []
    full = []
    for ix in range(ix0, ix1 + 1):
        x0 = minx + ix * w
        x1 = x0 + w
        for iy in range(iy0, iy1 + 1):
            y0 = miny + iy * h
            y1 = y0 + h
            corners_in = kernels.point_in_polygon(
                np.array([x0, x1, x1, x0]), np.array([y0, y0, y1, y1]), poly
            )
            if corners_in.all():
                # fully inside unless a polygon edge cuts through
                cut = _rect_edge_cut(x0, y0, x1, y1, poly)
                cells.append((ix, iy))
                full.append(not cut)
                continue
            if corners_in.any() or _poly_vertex_in_rect(x0, y0, x1, y1, poly) or _rect_edge_cut(x0, y0, x1, y1, poly):
                cells.append((ix, iy))
                full.append(False)
    if not cells:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=bool)
    ixs = np.array([c[0] for c in cells], dtype=np.int64)
    iys = np.array([c[1] for c in cells], dtype=np.int64)
    return _interleave_bits_np(ixs, iys, res), np.array(full, dtype=bool)


def _poly_vertex_in_rect(x0, y0, x1, y1, poly) -> bool:
    return bool(
        ((poly[:, 0] >= x0) & (poly[:, 0] <= x1) & (poly[:, 1] >= y0) & (poly[:, 1] <= y1)).any()
    )


def _rect_edge_cut(x0, y0, x1, y1, poly) -> bool:
    """Does any polygon edge intersect any rectangle edge?"""
    rect = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    n = len(poly)
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        for j in range(4):
            c, d = rect[j], rect[(j + 1) % 4]
            if _seg_intersect(a, b, c, d):
                return True
    return False


def _seg_intersect(a, b, c, d) -> bool:
    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    if o1 != o2 and o3 != o4:
        return True
    return False
