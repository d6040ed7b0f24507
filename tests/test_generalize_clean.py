"""Generalizer/cleaner parity with reference tests
(test_trajectory_generalizer.py, test_trajectory_cleaner.py)."""

import pytest

from movingspark import clean, generalize
from tests.conftest import rows_to_points


def coords(df):
    return [(r["x"], r["y"]) for r in df.orderBy("traj_id", "t").collect()]


@pytest.fixture(scope="module")
def zigzag(spark):
    # test_trajectory_generalizer.py:26-32
    return rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-02T00:00:00", 1, 0.1),
            (1, "1970-01-03T00:00:00", 2, 0.2),
            (1, "1970-01-04T00:00:00", 3, 0),
            (1, "1970-01-05T00:00:00", 3, 3),
        ],
    )


def test_douglas_peucker(spark, zigzag):
    got = coords(generalize.douglas_peucker(zigzag, tolerance=1))
    assert got == [(0, 0), (3, 0), (3, 3)]


def test_tdtr(spark, zigzag):
    got = coords(generalize.top_down_time_ratio(zigzag, tolerance=1))
    assert got == [(0, 0), (3, 0), (3, 3)]


def test_tdtr_different_than_dp(spark):
    # test_trajectory_generalizer.py:93-105
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T01:00:00", 1, 0.1),
            (1, "1970-01-01T07:00:00", 1, 2),
            (1, "1970-01-01T15:00:00", 2, 2),
            (1, "1970-01-01T16:00:00", 3, 0),
            (1, "1970-01-01T17:00:00", 3, 3),
        ],
    )
    got = coords(generalize.top_down_time_ratio(df, tolerance=1))
    assert got == [(0, 0), (1, 2), (2, 2), (3, 0), (3, 3)]


def test_max_distance(spark, zigzag):
    got = coords(generalize.max_distance(zigzag, tolerance=1))
    assert got == [(0, 0), (3, 0), (3, 3)]


def test_min_time_delta(spark):
    # test_trajectory_generalizer.py:123-134
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:06:00", 1, 0.1),
            (1, "1970-01-01T00:10:00", 2, 0.2),
            (1, "1970-01-01T00:30:00", 3, 0),
            (1, "1970-01-01T00:59:00", 3, 3),
        ],
    )
    got = coords(generalize.min_timedelta(df, tolerance_s=600))
    assert got == [(0, 0), (2, 0.2), (3, 0), (3, 3)]


def test_min_distance(spark):
    # test_trajectory_generalizer.py:136-147
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-02T00:00:00", 0, 0.1),
            (1, "1970-01-03T00:00:00", 0, 0.2),
            (1, "1970-01-04T00:00:00", 0, 1),
            (1, "1970-01-05T00:00:00", 0, 3),
        ],
    )
    got = coords(generalize.min_distance(df, tolerance=1))
    assert got == [(0, 0), (0, 1), (0, 3)]


def test_min_time_delta_collection(spark):
    # test_trajectory_generalizer.py:149-157
    df = rows_to_points(
        spark,
        [
            (1, "2018-01-01T12:00:00", 0, 0),
            (1, "2018-01-01T12:06:00", 6, 0),
            (1, "2018-01-01T14:10:00", 6, 6),
            (1, "2018-01-01T14:15:00", 9, 9),
            (2, "2018-01-01T12:00:00", 10, 10),
            (2, "2018-01-01T12:06:00", 16, 10),
            (2, "2018-01-02T13:10:00", 16, 16),
            (2, "2018-01-02T13:15:00", 190, 19),
        ],
    )
    out = generalize.min_timedelta(df, tolerance_s=600)
    got = {}
    for r in out.orderBy("traj_id", "t").collect():
        got.setdefault(r["traj_id"], []).append((r["x"], r["y"]))
    assert got["1"] == [(0, 0), (6, 6), (9, 9)]
    assert got["2"] == [(10, 10), (16, 16), (190, 19)]


def test_iqr_cleaner(spark):
    # test_trajectory_cleaner.py:40-70 semantics: vals with outliers
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0, 1.0),
            (1, "1970-01-01T00:00:10", 1, 0, 2.0),
            (1, "1970-01-01T00:00:20", 2, 0, 3.0),
            (1, "1970-01-01T00:00:30", 3, 0, 100.0),
            (1, "1970-01-01T00:00:40", 4, 0, 2.0),
        ],
        extra_cols=("val",),
    )
    df = df.withColumn("val", df["val"].cast("double"))
    out = clean.iqr_clean(df, {"val": 3})
    vals = [r["val"] for r in out.orderBy("t").collect()]
    assert vals == [1.0, 2.0, 3.0, 2.0]


def test_outlier_cleaner_explicit_vmax(spark):
    # spike at row 2: speed 0->1 fine, 1->101 huge, 101->2 huge from spike
    # but allowed from last kept
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 1, 0),
            (1, "1970-01-01T00:00:02", 101, 0),
            (1, "1970-01-01T00:00:03", 3, 0),
            (1, "1970-01-01T00:00:04", 4, 0),
        ],
    )
    got = coords(clean.outlier_clean(df, v_max=10))
    assert got == [(0, 0), (1, 0), (3, 0), (4, 0)]


def test_outlier_cleaner_invalid_returns_original(spark):
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 1000, 0),
            (1, "1970-01-01T00:00:02", 2000, 0),
        ],
    )
    # v_max so strict everything after row 0 would drop -> return original
    got = coords(clean.outlier_clean(df, v_max=0.001))
    assert got == [(0, 0), (1000, 0), (2000, 0)]
