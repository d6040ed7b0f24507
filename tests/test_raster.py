"""Raster -> vector conversion (movingspark/raster.py): planted-grid
ground truth for vectorize_tiles and raster_regions."""

import pyspark.sql.functions as F
import pytest

from movingspark import raster

BOUNDS = (0.0, 0.0, 16.0, 16.0)
RES = 4  # 16x16 grid, 1x1 cells: data coords == grid coords


def _pts(spark, cells_with_counts):
    """cells_with_counts: {(ix, iy): n} -> point table with n points in
    the middle of each cell, each its own trajectory."""
    rows = []
    for (ix, iy), n in cells_with_counts.items():
        for k in range(n):
            rows.append((f"t{ix}_{iy}_{k}", k, ix + 0.5, iy + 0.5))
    return spark.createDataFrame(rows, "traj_id string, t long, x double, y double")


def test_vectorize_tiles_wkt_and_counts(spark):
    pts = _pts(spark, {(0, 0): 3, (5, 7): 1})
    out = {r["cell"]: r for r in raster.vectorize_tiles(pts, RES, BOUNDS).collect()}
    assert len(out) == 2
    c00 = out[0]
    assert c00["n_points"] == 3 and c00["n_trajs"] == 3
    assert c00["wkt"] == (
        "POLYGON ((0.000000 0.000000, 1.000000 0.000000, "
        "1.000000 1.000000, 0.000000 1.000000, 0.000000 0.000000))"
    )
    c57 = next(r for c, r in out.items() if c != 0)
    assert "5.000000 7.000000" in c57["wkt"] and "6.000000 8.000000" in c57["wkt"]


@pytest.mark.parametrize("max_local", [200_000, 0])  # union-find / distributed CC
def test_raster_regions_two_blobs_and_threshold(spark, max_local):
    # blob A: L-shaped tromino at (0,0),(1,0),(1,1) — one region.
    # blob B: diagonal pair (5,5),(6,6) — NOT 4-adjacent, two regions.
    # (9,9) has 1 point: killed by min_points=2.
    pts = _pts(
        spark,
        {(0, 0): 2, (1, 0): 3, (1, 1): 2, (5, 5): 2, (6, 6): 4, (9, 9): 1},
    )
    rows = sorted(
        raster.raster_regions(pts, RES, 2, BOUNDS, max_local_cells=max_local).collect(),
        key=lambda r: r["region_id"],
    )
    assert len(rows) == 3
    blob_a = rows[0]
    assert blob_a["region_id"] == 0  # min morton id of the tromino
    assert blob_a["n_cells"] == 3 and blob_a["n_points"] == 7
    assert (blob_a["x_min"], blob_a["y_min"], blob_a["x_max"], blob_a["y_max"]) == (
        0.0, 0.0, 2.0, 2.0
    )
    # the diagonal cells stay separate singleton regions
    singles = rows[1:]
    assert all(r["n_cells"] == 1 for r in singles)
    assert {r["n_points"] for r in singles} == {2, 4}
    assert {(r["x_min"], r["y_min"]) for r in singles} == {(5.0, 5.0), (6.0, 6.0)}


def test_raster_regions_wraps_nothing_across_grid_edges(spark):
    # (15, 3) and (0, 4): ix+1 would wrap to 16 (clipped domain edge) —
    # they must NOT merge; adjacency is grid arithmetic, not modular.
    pts = _pts(spark, {(15, 3): 2, (0, 4): 2})
    rows = raster.raster_regions(pts, RES, 2, BOUNDS).collect()
    assert len(rows) == 2


def test_raster_regions_empty_when_all_below_threshold(spark):
    pts = _pts(spark, {(2, 2): 1, (3, 3): 1})
    assert raster.raster_regions(pts, RES, 2, BOUNDS).count() == 0


def test_rasterize_value_sum(spark):
    pts = _pts(spark, {(4, 4): 2}).withColumn("v", F.col("x") + F.col("y"))
    r = raster.rasterize(pts, RES, BOUNDS, value_col="v").collect()[0]
    assert r["sum_value"] == pytest.approx(2 * (4.5 + 4.5))
    assert (r["ix"], r["iy"]) == (4, 4)


def test_raster_regions_local_and_distributed_paths_identical(spark):
    # spiral-ish scatter with several multi-cell blobs
    cells_counts = {}
    for k in range(40):
        ix, iy = (k * 3) % 13, (k * 5) % 11
        cells_counts[(ix, iy)] = 2 + k % 4
        cells_counts[(ix + 1, iy)] = 2
    pts = _pts(spark, cells_counts)
    a = sorted(map(tuple, raster.raster_regions(pts, RES, 2, BOUNDS).collect()))
    b = sorted(
        map(tuple, raster.raster_regions(pts, RES, 2, BOUNDS, max_local_cells=0).collect())
    )
    assert a == b


def test_corridor_cells_supercover(spark):
    import datetime as dt

    E0 = dt.datetime(2024, 1, 1)
    # 16x16 bounds at res 3 -> 2x2 cells. One diagonal segment from
    # (1,1) to (7,5): passes cells (0,0),(1,1),(2,1),(2,2),(3,2) in grid
    # coords... compute expected with a tiny reference supercover.
    bounds = (0.0, 0.0, 16.0, 16.0)
    res = 3
    pts = [(1.0, 1.0), (7.0, 5.0)]
    df = spark.createDataFrame(
        [("a", E0 + dt.timedelta(seconds=i), x, y) for i, (x, y) in enumerate(pts)],
        "traj_id string, t timestamp, x double, y double",
    )
    got = {r["cell"] for r in raster.corridor_cells(df, res, bounds).collect()}

    # reference: dense sampling of the segment (far denser than cells)
    import numpy as np

    from movingspark import cells as C

    t = np.linspace(0, 1, 20001)
    xs = 1.0 + t * 6.0
    ys = 1.0 + t * 4.0
    expect = set(C.cell_id_np(xs, ys, res, bounds).tolist())
    assert got == expect and len(got) >= 4


def test_corridor_cells_axis_aligned_and_point_segment(spark):
    import datetime as dt

    E0 = dt.datetime(2024, 1, 1)
    bounds = (0.0, 0.0, 16.0, 16.0)
    df = spark.createDataFrame(
        [
            ("h", E0, 1.0, 1.0), ("h", E0 + dt.timedelta(seconds=1), 15.0, 1.0),  # horizontal: 8 cells
            ("p", E0, 5.0, 5.0), ("p", E0 + dt.timedelta(seconds=1), 5.0, 5.0),  # zero length -> its own cell
        ],
        "traj_id string, t timestamp, x double, y double",
    )
    rows = raster.corridor_cells(df, 3, bounds).collect()
    by = {}
    for r in rows:
        by.setdefault(r["traj_id"], set()).add(r["cell"])
    assert len(by["h"]) == 8  # crosses all 8 columns in row 0
    assert len(by["p"]) == 1


def test_corridor_cells_no_python(spark):
    import datetime as dt

    E0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", E0, 1.0, 1.0), ("a", E0 + dt.timedelta(seconds=1), 2.0, 2.0)],
        "traj_id string, t timestamp, x double, y double",
    )
    plan = raster.corridor_cells(df, 3, (0.0, 0.0, 16.0, 16.0))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_hotspot_gi_statistic(spark):
    import math

    # 5 occupied cells: a 2x2 hot block of 10s + one far cell of 2.
    pts = _pts(
        spark,
        {(3, 3): 10, (4, 3): 10, (3, 4): 10, (4, 4): 10, (12, 12): 2},
    )
    rows = {r["cell"]: r for r in raster.hotspot_gi(pts, RES, BOUNDS).collect()}
    assert len(rows) == 5
    counts = [10, 10, 10, 10, 2]
    N, mean = 5, sum(counts) / 5
    s = math.sqrt(sum(c * c for c in counts) / N - mean * mean)

    def gi(sw, ni):
        return (sw - mean * ni) / (s * math.sqrt((N * ni - ni * ni) / (N - 1)))

    # each block cell neighbors the other three (+self): sw=40, ni=4
    from movingspark import cells as C
    import numpy as np

    block = C.cell_id_np(np.array([3.5, 4.5, 3.5, 4.5]), np.array([3.5, 3.5, 4.5, 4.5]), RES, BOUNDS)
    far = int(C.cell_id_np(np.array([12.5]), np.array([12.5]), RES, BOUNDS)[0])
    for c in block:
        r = rows[int(c)]
        assert r["n_neighbors"] == 4 and r["neighborhood_points"] == 40
        assert r["gi_z"] == pytest.approx(gi(40, 4), abs=1e-5)
    r = rows[far]
    assert r["n_neighbors"] == 1 and r["neighborhood_points"] == 2
    assert r["gi_z"] == pytest.approx(gi(2, 1), abs=1e-5)
    assert r["gi_z"] < 0 < rows[int(block[0])]["gi_z"]


def test_hotspot_gi_degenerate_variance_is_null(spark):
    # two isolated cells with identical counts: s = 0 -> gi_z NULL
    pts = _pts(spark, {(1, 1): 3, (12, 12): 3})
    rows = raster.hotspot_gi(pts, RES, BOUNDS).collect()
    assert len(rows) == 2 and all(r["gi_z"] is None for r in rows)
