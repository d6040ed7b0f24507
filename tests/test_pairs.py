"""Trajectory-pair distance / Hausdorff (SURVEY.md §2; reference
trajectory.py:1548-1627, pinned values from test_trajectory.py:1130-1176)."""

import math

import numpy as np
import pytest

from movingspark import kernels, pairs
from tests.conftest import rows_to_points


def _traj(spark, tid, pts):
    return rows_to_points(
        spark,
        [(tid, f"2020-01-0{i + 1}T00:00:00", x, y) for i, (x, y) in enumerate(pts)],
    )


def test_kernel_polyline_min_distance():
    a = np.array([(0, 0), (1, 1), (3, 3)], float)
    assert kernels.polyline_min_distance(a, np.array([(0.0, 0.0)])) == 0.0
    assert kernels.polyline_min_distance(a, np.array([(2, 0), (2, 4), (3, 4)], float)) == 0.0
    assert kernels.polyline_min_distance(a, np.array([(2, 4), (3, 4)], float)) == 1.0


def test_kernel_discrete_hausdorff():
    a = np.array([(0, 0), (1, 1), (2, 2)], float)
    assert kernels.discrete_hausdorff_line(a, np.array([(0.0, 0.0)])) == math.sqrt(8)
    assert kernels.discrete_hausdorff_line(a, np.array([(2, 0), (2, 4), (3, 4)], float)) == math.sqrt(5)


def test_trajectory_pair_metrics(spark):
    """traj.distance(traj2)==0 and traj.hausdorff_distance(traj2)==sqrt(5)
    (test_trajectory.py:1138-1139, 1161-1162)."""
    df = _traj(spark, 1, [(0, 0), (1, 1), (3, 3)]).unionByName(
        _traj(spark, 2, [(2, 0), (2, 4), (3, 4)])
    ).unionByName(_traj(spark, 3, [(0, 0), (1, 1), (2, 2)]))
    out = {
        (r["traj_a"], r["traj_b"]): (r["min_distance"], r["hausdorff"])
        for r in pairs.trajectory_pair_metrics(df, [("1", "2"), ("3", "2")]).collect()
    }
    d12, h12 = out[("1", "2")]
    assert d12 == 0.0
    d32, h32 = out[("3", "2")]
    assert h32 == pytest.approx(math.sqrt(5), abs=1e-12)


def test_trajectory_to_line_metrics(spark):
    df = _traj(spark, 1, [(0, 0), (1, 1), (3, 3)]).unionByName(
        _traj(spark, 3, [(0, 0), (1, 1), (2, 2)])
    )
    # distance: traj1 vs LineString [(2,4),(3,4)] == 1 (test:1136-1137)
    out = {r["traj_id"]: r for r in pairs.trajectory_to_line_metrics(df, [(2, 4), (3, 4)]).collect()}
    assert out["1"]["min_distance"] == 1.0
    # hausdorff: traj3 vs LineString [(2,0),(2,4),(3,4)] == sqrt(5) (test:1158-1159)
    out2 = {
        r["traj_id"]: r
        for r in pairs.trajectory_to_line_metrics(df, [(2, 0), (2, 4), (3, 4)]).collect()
    }
    assert out2["3"]["hausdorff"] == pytest.approx(math.sqrt(5), abs=1e-12)
    # point geometry: distance 0, hausdorff sqrt(8) (test:1132-1133, 1156-1157)
    out3 = {r["traj_id"]: r for r in pairs.trajectory_to_line_metrics(df, (0.0, 0.0)).collect()}
    assert out3["1"]["min_distance"] == 0.0
    assert out3["3"]["hausdorff"] == pytest.approx(math.sqrt(8), abs=1e-12)


def test_distance_to_point_sql_path(spark):
    df = _traj(spark, 1, [(0, 0), (1, 1), (3, 3)])
    got = pairs.distance_to_point(df, 0.0, 0.0).collect()[0]["min_distance"]
    assert got == 0.0
    got2 = pairs.distance_to_point(df, 2.0, 0.0).collect()[0]["min_distance"]
    # closest point on y=x line to (2,0) is (1,1): sqrt(2)
    assert got2 == pytest.approx(math.sqrt(2), abs=1e-12)
