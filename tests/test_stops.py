"""Stop detector parity with reference test_trajectory_stop_detector.py."""

import datetime as dt

import pytest

from movingspark import stops
from tests.conftest import rows_to_points


@pytest.fixture(scope="module")
def track(spark):
    # test_trajectory_stop_detector.py:22-35
    return rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 10),
            (1, "1970-01-01T00:00:02", 0, 20),
            (1, "1970-01-01T00:00:04", 0, 21),
            (1, "1970-01-01T00:00:06", 0, 22),
            (1, "1970-01-01T00:00:08", 0, 30),
            (1, "1970-01-01T00:00:10", 0, 40),
            (1, "1970-01-01T00:00:15", 1, 50),
        ],
    )


def test_stop_time_ranges_middle_stop(spark, track):
    ranges = stops.get_stop_time_ranges(track, max_diameter=3, min_duration_s=2).collect()
    assert len(ranges) == 1
    assert ranges[0]["start_t"] == dt.datetime(1970, 1, 1, 0, 0, 2)
    assert ranges[0]["end_t"] == dt.datetime(1970, 1, 1, 0, 0, 6)


def test_stop_points_middle_stop(spark, track):
    pts = stops.get_stop_points(track, max_diameter=3, min_duration_s=2).collect()
    assert len(pts) == 1
    p = pts[0]
    assert p["x"] == 0 and p["y"] == 21  # median of stop rows
    assert p["start_time"] == dt.datetime(1970, 1, 1, 0, 0, 2)
    assert p["end_time"] == dt.datetime(1970, 1, 1, 0, 0, 6)
    assert p["duration_s"] == 4.0
    assert p["traj_id"] == "1"
    assert p["stop_id"] == "1_1970-01-01 00:00:02"


def test_stop_at_start(spark):
    # test_trajectory_stop_detector.py:88-110
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 1),
            (1, "1970-01-01T00:00:02", 0, 2),
            (1, "1970-01-01T00:00:03", 0, 1),
            (1, "1970-01-01T00:00:04", 0, 22),
            (1, "1970-01-01T00:00:08", 0, 30),
            (1, "1970-01-01T00:00:10", 0, 40),
            (1, "1970-01-01T00:00:15", 1, 50),
        ],
    )
    ranges = stops.get_stop_time_ranges(df, max_diameter=3, min_duration_s=2).collect()
    assert len(ranges) == 1
    assert ranges[0]["start_t"] == dt.datetime(1970, 1, 1, 0, 0, 0)
    assert ranges[0]["end_t"] == dt.datetime(1970, 1, 1, 0, 0, 3)


def test_stop_at_end_trailing_flush(spark):
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 10),
            (1, "1970-01-01T00:00:02", 0, 20),
            (1, "1970-01-01T00:00:04", 0, 21),
            (1, "1970-01-01T00:00:06", 0, 22),
        ],
    )
    ranges = stops.get_stop_time_ranges(df, max_diameter=3, min_duration_s=2).collect()
    assert len(ranges) == 1
    assert ranges[0]["start_t"] == dt.datetime(1970, 1, 1, 0, 0, 2)
    assert ranges[0]["end_t"] == dt.datetime(1970, 1, 1, 0, 0, 6)


def test_no_stop(spark):
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 10),
            (1, "1970-01-01T00:00:02", 0, 20),
            (1, "1970-01-01T00:00:03", 0, 30),
        ],
    )
    assert stops.get_stop_time_ranges(df, max_diameter=3, min_duration_s=2).count() == 0


def test_multiple_trajectories_parallel(spark):
    rows = []
    for tid in (1, 2):
        rows += [
            (tid, "1970-01-01T00:00:00", 0, 0),
            (tid, "1970-01-01T00:00:01", 0, 10),
            (tid, "1970-01-01T00:00:02", 0, 20),
            (tid, "1970-01-01T00:00:04", 0, 21),
            (tid, "1970-01-01T00:00:06", 0, 22),
            (tid, "1970-01-01T00:00:08", 0, 30),
        ]
    df = rows_to_points(spark, rows)
    ranges = stops.get_stop_time_ranges(df, max_diameter=3, min_duration_s=2)
    got = {(r["traj_id"], r["start_t"].second, r["end_t"].second) for r in ranges.collect()}
    assert got == {("1", 2, 6), ("2", 2, 6)}
