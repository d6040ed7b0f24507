"""to_traj_gdf general agg API (reference trajectory.py:661-713; pinned
values from test_trajectory.py:1056-1086)."""

import pytest
from pyspark.sql import functions as F

from movingspark import queries as q
from tests.conftest import rows_to_points


@pytest.fixture
def traj3(spark):
    # the reference's to_traj_gdf fixture: length 12, direction 45
    return rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:06:00", 6, 0),
            (1, "1970-01-01T00:10:00", 6, 6),
        ],
    )


def test_to_traj_gdf_base_and_wkt(spark, traj3):
    row = q.to_traj_gdf(traj3, wkt=True).collect()[0]
    assert row["length"] == 12.0
    assert row["direction"] == 45.0
    assert row["start_t"].isoformat() == "1970-01-01T00:00:00"
    assert row["end_t"].isoformat() == "1970-01-01T00:10:00"
    assert row["wkt"] == "LINESTRING M (0.0 0.0 0.0, 6.0 0.0 360.0, 6.0 6.0 600.0)"


def test_to_traj_gdf_agg(spark, traj3):
    df = traj3.withColumn(
        "val", F.when(F.col("x") == 0, 7.0).otherwise(2.0)
    ).withColumn("cat", F.when(F.col("y") == 6, "b").otherwise("a"))
    out = q.to_traj_gdf(
        df, agg={"val": ["mode", "q95", "max", "mean"], "cat": "mode"}
    ).collect()[0]
    # vals = [7, 2, 2] -> mode 2 (most frequent), max 7, mean 11/3
    assert out["val_mode"] == 2.0
    assert out["val_max"] == 7.0
    assert out["val_mean"] == pytest.approx(11 / 3)
    # pandas q95 of [7,2,2] (sorted [2,2,7]): 0.95*(3-1)=1.9 -> 2 + 0.9*(7-2)
    assert out["val_q95"] == pytest.approx(2 + 0.9 * 5)
    assert out["cat_mode"] == "a"


def test_to_traj_gdf_mode_tie_smallest(spark, traj3):
    # pandas Series.mode()[0]: ties resolve to the smallest value
    df = traj3.withColumn("v", F.col("y"))  # [0, 0, 6] -> mode 0; tie case below
    out = q.to_traj_gdf(df, agg={"v": "mode"}).collect()[0]
    assert out["v_mode"] == 0.0
    df2 = traj3.withColumn("v", F.col("x"))  # [0, 6, 6] -> 6 wins (count 2)
    out2 = q.to_traj_gdf(df2, agg={"v": "mode"}).collect()[0]
    assert out2["v_mode"] == 6.0


def test_to_traj_gdf_rejects_unknown_agg(spark, traj3):
    with pytest.raises(ValueError):
        q.to_traj_gdf(traj3, agg={"x": "frobnicate"})


def test_get_start_end_locations_with_direction(spark, traj3):
    """trajectory_collection.py:416-436: start/end rows, optionally with
    the movement-direction column (first row patched with the first
    segment's direction — (0,0)->(6,0) is due east = 90 deg)."""
    start = q.get_start_locations(traj3, with_direction=True).collect()
    assert len(start) == 1
    assert start[0]["x"] == 0.0 and start[0]["direction"] == 90.0
    end = q.get_end_locations(traj3, with_direction=True).collect()
    assert end[0]["x"] == 6.0 and end[0]["y"] == 6.0
    assert end[0]["direction"] == 0.0  # (6,0)->(6,6) is due north


def test_get_locations_at_drop_outside(spark, traj3):
    """trajectory_collection.py:393-394: trajectories whose range does
    not contain t are skipped when drop_outside=True."""
    import datetime as dt

    t = dt.datetime(1970, 1, 2)  # after traj3's end
    assert q.get_locations_at(traj3, t, drop_outside=True).count() == 0
    assert q.get_locations_at(traj3, t).count() == 1  # as-of default keeps it
