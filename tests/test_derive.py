"""Derived-column parity with reference test_trajectory.py pinned values."""

import pytest
from pyspark.sql import functions as F

from movingspark import derive, schema
from tests.conftest import rows_to_points


def _vals(df, col, order=("traj_id", "t")):
    return [r[col] for r in df.orderBy(*order).collect()]


@pytest.fixture(scope="module")
def grid5(spark):
    # default_traj_metric_5 (test_trajectory.py:85-96)
    return rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:10", 6, 0),
            (1, "1970-01-01T00:00:20", 10, 0),
            (1, "1970-01-01T00:00:30", 10, 10),
            (1, "1970-01-01T00:00:40", 0, 10),
        ],
    )


@pytest.fixture(scope="module")
def square4(spark):
    # add_direction fixture (test_trajectory.py:339-344)
    return rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-02T00:00:00", 6, 0),
            (1, "1970-01-03T00:00:00", 6, -6),
            (1, "1970-01-04T00:00:00", -6, -6),
        ],
    )


def test_add_timedelta_first_null(spark, grid5):
    out = derive.add_timedelta(grid5)
    vals = _vals(out, schema.TIMEDELTA)
    assert vals[0] is None
    assert vals[1:] == [10.0, 10.0, 10.0, 10.0]


def test_add_distance_first_zero(spark, grid5):
    out = derive.add_distance(grid5)
    assert _vals(out, schema.DISTANCE) == [0.0, 6.0, 4.0, 10.0, 10.0]


def test_add_distance_km(spark, grid5):
    out = derive.add_distance(grid5, units="km")
    assert _vals(out, schema.DISTANCE) == [0.0, 0.006, 0.004, 0.01, 0.01]


def test_add_speed(spark):
    # test_trajectory.py:443-446: 6 m in 1 s -> [6, 6]
    df = rows_to_points(
        spark,
        [(1, "1970-01-01T00:00:00", 0, 0), (1, "1970-01-01T00:00:01", 6, 0)],
    )
    assert _vals(derive.add_speed(df), schema.SPEED) == [6.0, 6.0]
    # with units ("km","h") -> 21.6 (test_trajectory.py:448-451)
    assert _vals(derive.add_speed(df, units=("km", "h")), schema.SPEED) == [21.6, 21.6]


def test_add_acceleration(spark):
    # test_trajectory.py:541-559
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 6, 0),
            (1, "1970-01-01T00:00:02", 18, 0),
        ],
    )
    assert _vals(derive.add_acceleration(df), schema.ACCELERATION) == [0.0, 0.0, 6.0]
    assert _vals(derive.add_acceleration(df, units="km"), schema.ACCELERATION) == [
        0.0,
        0.0,
        0.006,
    ]
    out = _vals(derive.add_acceleration(df, units=("km", "h")), schema.ACCELERATION)
    assert out == pytest.approx([0.0, 0.0, 21.6])
    out = _vals(derive.add_acceleration(df, units=("km", "h", "min")), schema.ACCELERATION)
    assert out == pytest.approx([0.0, 0.0, 1296.0])


def test_add_direction(spark, square4):
    # test_trajectory.py:339-344: [90, 90, 180, 270]
    assert _vals(derive.add_direction(square4), schema.DIRECTION) == [90.0, 90.0, 180.0, 270.0]


def test_add_direction_latlon(spark):
    df = rows_to_points(
        spark,
        [(1, "1970-01-01T00:00:00", 0, 0), (1, "1970-01-02T00:00:00", 10, 10)],
    )
    out = _vals(derive.add_direction(df, latlon=True), schema.DIRECTION)
    assert out[0] == pytest.approx(44.561451413257714, abs=1e-4)
    assert out[1] == pytest.approx(44.561451413257714, abs=1e-4)


def test_add_angular_difference(spark, square4):
    # test_trajectory.py:389-394: [0, 0, 90, 90]
    out = derive.add_angular_difference(square4)
    assert _vals(out, schema.ANGULAR_DIFFERENCE) == [0.0, 0.0, 90.0, 90.0]
    # temp direction column dropped again
    assert schema.DIRECTION not in out.columns


def test_add_distance_latlon(spark):
    # test_trajectory.py:712-723
    df = rows_to_points(
        spark,
        [(1, "1970-01-01T00:00:00", 0, 1), (1, "1970-01-01T00:00:01", 6, 0)],
    )
    out = _vals(derive.add_distance(df, latlon=True), schema.DISTANCE)
    assert out[1] / 1000 == pytest.approx(676.3, abs=1)
    out = _vals(derive.add_distance(df, latlon=True, units="nm"), schema.DISTANCE)
    assert out[1] == pytest.approx(365, abs=1)


def test_add_speed_latlon(spark):
    # test_trajectory.py:503-506: speed/1000 ~ 676.3 (approx abs=1)
    df = rows_to_points(
        spark,
        [(1, "1970-01-01T00:00:00", 0, 1), (1, "1970-01-01T00:00:01", 6, 0)],
    )
    out = _vals(derive.add_speed(df, latlon=True), schema.SPEED)
    assert out[0] / 1000 == pytest.approx(676.3, abs=1)


def test_multi_trajectory_independence(spark):
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 6, 0),
            (2, "1970-01-01T00:00:00", 0, 0),
            (2, "1970-01-01T00:00:02", 4, 0),
        ],
    )
    out = derive.add_speed(df)
    got = {(r["traj_id"], r["t"].second): r[schema.SPEED] for r in out.collect()}
    assert got[("1", 0)] == 6.0 and got[("1", 1)] == 6.0
    assert got[("2", 0)] == 2.0 and got[("2", 2)] == 2.0


def test_apply_offset_seconds(spark, grid5):
    out = derive.apply_offset_seconds(grid5.withColumn("v", F.col("x")), "v", 10)
    vals = _vals(out, "v")
    assert vals == [6.0, 10.0, 10.0, 0.0, None]
