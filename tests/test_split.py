"""Splitter parity with reference test_trajectory_splitter.py."""

import pytest

from movingspark import split
from tests.conftest import rows_to_points


def pieces(df):
    """{piece_traj_id: [(x, y), ...] in time order}"""
    out = {}
    for r in df.orderBy("traj_id", "t").collect():
        out.setdefault(r["traj_id"], []).append((r["x"], r["y"]))
    return out


@pytest.fixture(scope="module")
def collection(spark):
    # two-trajectory fixture (test_trajectory_splitter.py:27-42)
    return rows_to_points(
        spark,
        [
            (1, "2018-01-01T12:00:00", 0, 0, "9", "a"),
            (1, "2018-01-01T12:06:00", 6, 0, "5", "a"),
            (1, "2018-01-01T14:10:00", 6, 6, "2", "a"),
            (1, "2018-01-01T14:15:00", 9, 9, "4", "a"),
            (2, "2018-01-01T12:00:00", 10, 10, "10", "a"),
            (2, "2018-01-01T12:06:00", 16, 10, "6", "a"),
            (2, "2018-01-02T13:10:00", 16, 16, "7", "b"),
            (2, "2018-01-02T13:15:00", 190, 19, "3", "b"),
        ],
        extra_cols=("val", "val2"),
    )


def test_split_by_observation_gap(spark):
    # test_trajectory_splitter.py:188-197
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:01:00", 0, 0),
            (1, "1970-01-01T00:05:00", 0, 0),
            (1, "1970-01-01T00:06:00", 0, 0),
        ],
    )
    got = pieces(split.split_by_observation_gap(df, 120))
    assert set(got) == {"1_0", "1_1"}
    assert len(got["1_0"]) == 2 and len(got["1_1"]) == 2


def test_split_by_observation_gap_skip_single_points(spark):
    # test_trajectory_splitter.py:199-205: pieces of 1 row dropped but
    # still counted in the enumeration (1_0 kept, 1_1 and 1_2 dropped)
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:01:00", 0, 0),
            (1, "1970-01-01T00:05:00", 0, 0),
            (1, "1970-01-01T00:07:00", 0, 0),
        ],
    )
    got = pieces(split.split_by_observation_gap(df, 61))
    assert set(got) == {"1_0"}
    assert len(got["1_0"]) == 2


def test_collection_split_by_observation_gap(spark, collection):
    got = pieces(split.split_by_observation_gap(collection, 3600))
    assert len(got) == 4


def test_temporal_split_daybreak(spark):
    # test_trajectory_splitter.py:44-55: boundary row duplicated
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 0),
            (1, "1970-01-02T00:00:00", 0, 0),
            (1, "1970-01-02T00:00:01", 0, 0),
        ],
    )
    got = pieces(split.split_temporally(df, "day"))
    assert set(got) == {"1_0", "1_1"}
    assert len(got["1_0"]) == 3  # day-1 rows + first row of day 2
    assert len(got["1_1"]) == 2


def test_temporal_split_raw_freq_2h(spark):
    # test_trajectory_splitter.py:115-125 (test_split_by_2H): raw pandas
    # tick alias "2h" forwarded like pd.Grouper(freq="2h"); boundary row
    # duplicated into the earlier piece
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 0),
            (1, "1970-01-01T02:00:00", 0, 0),
            (1, "1970-01-01T02:00:01", 0, 0),
        ],
    )
    got = pieces(split.split_temporally(df, "2h"))
    assert set(got) == {"1_0", "1_1"}
    assert len(got["1_0"]) == 3 and len(got["1_1"]) == 2


def test_temporal_split_raw_freq_origin_start_day(spark):
    # pd.Grouper(origin='start_day'): bins anchor at midnight of the
    # trajectory's FIRST observation day, not at the first observation —
    # points at 01:30 and 02:30 fall in different 2h bins (00-02, 02-04)
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-05T01:30:00", 0, 0),
            (1, "1970-01-05T01:45:00", 0, 0),
            (1, "1970-01-05T02:30:00", 0, 0),
            (1, "1970-01-05T02:45:00", 0, 0),
        ],
    )
    got = pieces(split.split_temporally(df, "2h"))
    assert set(got) == {"1_0", "1_1"}


def test_temporal_split_rejects_unknown_mode(spark):
    import pytest

    df = rows_to_points(spark, [(1, "1970-01-01T00:00:00", 0, 0)])
    with pytest.raises(ValueError):
        split.split_temporally(df, "fortnight")


def test_temporal_split_ignores_single_node_segments(spark):
    # test_trajectory_splitter.py:79-86: trailing 1-row bucket merges into
    # previous piece via duplication; the 1-row piece itself is dropped
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 0),
            (1, "1970-01-02T00:00:00", 0, 0),
        ],
    )
    got = pieces(split.split_temporally(df, "day"))
    assert set(got) == {"1_0"}
    assert len(got["1_0"]) == 3


def test_temporal_split_nonadjacent_years(spark):
    # test_trajectory_splitter.py:88-104: empty buckets skipped in the
    # piece enumeration (1970 -> piece 0, 2000 -> piece 1)
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 0),
            (1, "2000-01-01T00:00:00", 0, 0),
            (1, "2000-01-01T00:00:01", 0, 0),
        ],
    )
    got = pieces(split.split_temporally(df, "day"))
    assert set(got) == {"1_0", "1_1"}


def test_collection_split_by_date(spark, collection):
    got = pieces(split.split_temporally(collection, "day"))
    assert len(got) == 3


def test_speed_splitter(spark):
    # test_trajectory_splitter.py:233-249
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 10),
            (1, "1970-01-01T00:00:02", 0, 20),
            (1, "1970-01-01T00:00:03", 0, 21),
            (1, "1970-01-01T00:00:04", 0, 22),
            (1, "1970-01-01T00:00:05", 0, 30),
            (1, "1970-01-01T00:00:06", 0, 40),
        ],
    )
    got = pieces(split.split_by_speed(df, speed=5, duration_s=2))
    assert len(got) == 2


def test_speed_splitter_max_speed(spark):
    # test_trajectory_splitter.py:269-292
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 2),
            (1, "1970-01-01T00:00:02", 0, 12),
            (1, "1970-01-01T00:00:03", 0, 22),
            (1, "1970-01-01T00:00:04", 0, 24),
            (1, "1970-01-01T00:00:05", 0, 26),
            (1, "1970-01-01T00:00:06", 0, 27),
            (1, "1970-01-01T00:00:07", 0, 28),
            (1, "1970-01-01T00:00:08", 0, 30),
            (1, "1970-01-01T00:00:09", 0, 32),
        ],
    )
    got = pieces(split.split_by_speed(df, speed=2, duration_s=2, max_speed=8))
    assert len(got) == 3


def test_split_by_value_change(spark, collection):
    # test_trajectory_splitter.py:520-534: ids 1_0, 2_0, 2_1; boundary
    # row duplication means piece 2_0 ends at the first 'b' row
    got = pieces(split.split_by_value_change(collection, "val2"))
    assert set(got) == {"1_0", "2_0", "2_1"}
    assert got["2_0"] == [(10.0, 10.0), (16.0, 10.0), (16.0, 16.0)]
    assert got["2_1"] == [(16.0, 16.0), (190.0, 19.0)]


def test_split_by_value_change_no_change(spark, collection):
    # splitting on a per-row-distinct column -> every row its own piece,
    # all 1-row pieces + boundary duplication -> n-1 pieces per traj... the
    # reference reports len == 6 for col 'val' (test:547-549)
    got = pieces(split.split_by_value_change(collection, "val"))
    assert len(got) == 6


def test_angle_splitter(spark):
    # test_trajectory_splitter.py:418-449
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 2, 0),
            (1, "1970-01-01T00:00:02", 4, 0),
            (1, "1970-01-01T00:00:04", 6, 1),
            (1, "1970-01-01T00:00:06", 8, 2),
            (1, "1970-01-01T00:00:08", 8, 4),
            (1, "1970-01-01T00:00:09", 8, 6),
            (1, "1970-01-01T00:00:10", 8, 8),
            (1, "1970-01-01T00:00:11", 10, 10),
            (1, "1970-01-01T00:00:12", 12, 12),
        ],
    )
    got = pieces(split.split_by_angle_change(df, min_angle=45, min_speed=1.0))
    assert got["1_0"] == [(0, 0), (2, 0), (4, 0), (6, 1), (8, 2)]
    assert got["1_1"] == [(8, 2), (8, 4), (8, 6), (8, 8)]
    assert got["1_2"] == [(8, 8), (10, 10), (12, 12)]

    # min_speed=1.5 variant (test:471-501)
    got = pieces(split.split_by_angle_change(df, min_angle=45, min_speed=1.5))
    assert got["1_0"] == [(0, 0), (2, 0), (4, 0), (6, 1), (8, 2), (8, 4)]
    assert got["1_1"] == [(8, 4), (8, 6), (8, 8)]
    assert got["1_2"] == [(8, 8), (10, 10), (12, 12)]


def test_stop_splitter(spark):
    # test_trajectory_splitter.py:294-320
    df = rows_to_points(
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
    got = pieces(split.split_by_stops(df, max_diameter=3, min_duration_s=2))
    vals = sorted(got.values(), key=len)
    assert len(got) == 2
    assert vals[0] == [(0, 0), (0, 10), (0, 20)]
    assert vals[1] == [(0, 22), (0, 30), (0, 40), (1, 50)]


def test_stop_splitter_min_length(spark):
    # test_trajectory_splitter.py:350-376
    df = rows_to_points(
        spark,
        [
            (1, "1970-01-01T00:00:00", 0, 0),
            (1, "1970-01-01T00:00:01", 0, 10),
            (1, "1970-01-01T00:00:02", 0, 20),
            (1, "1970-01-01T00:00:04", 0, 21),
            (1, "1970-01-01T00:00:06", 0, 22),
            (1, "1970-01-01T00:00:08", 0, 30),
            (1, "1970-01-01T00:00:10", 0, 40),
            (1, "1970-01-01T00:00:15", 1, 100),
        ],
    )
    got = pieces(split.split_by_stops(df, max_diameter=3, min_duration_s=2, min_length=25))
    assert len(got) == 1
    assert list(got.values())[0] == [(0, 22), (0, 30), (0, 40), (1, 100)]


def test_stop_splitter_stop_at_start(spark):
    # test_trajectory_splitter.py:396-416
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
    got = pieces(split.split_by_stops(df, max_diameter=3, min_duration_s=2))
    assert len(got) == 1
    assert list(got.values())[0] == [(0, 1), (0, 22), (0, 30), (0, 40), (1, 50)]
