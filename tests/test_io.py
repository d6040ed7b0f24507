"""MF-JSON reader parity (reference io.py:156-335 semantics, fixtures
synthesized to the same OGC MF-JSON shapes as the reference's test files)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from movingspark import io as mfio
from movingspark import queries as q

MOVINGPOINT = {
    "type": "Feature",
    "properties": {"id": 5},
    "temporalGeometry": {
        "type": "MovingPoint",
        "datetimes": ["2008-02-02T15:02:18", "2008-02-02T18:32:28"],
        "coordinates": [[116.52299, 40.07757], [116.52302, 39.92129]],
        "interpolation": "Linear",
    },
    "temporalProperties": [
        {
            "datetimes": ["2008-02-02T15:02:18", "2008-02-02T18:32:28"],
            "speed": {"type": "Measure", "values": [1.0, 2.0]},
        }
    ],
}

TRAJECTORY = {
    "type": "Feature",
    "geometry": {
        "type": "LineString",
        "coordinates": [[0, 0], [1, 0], [2, 0]],
    },
    "properties": {
        "datetimes": ["2020-01-01T00:00:00", "2020-01-01T00:01:00", "2020-01-01T00:02:00"],
        "static_attr": [7],
        "step_attr": ["a", "b"],  # n-1 -> last repeated
    },
}

COLLECTION = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"name": "tr1"},
            "temporalGeometry": {
                "type": "MovingPoint",
                "datetimes": ["2020-01-01T00:00:00", "2020-01-01T00:01:00"],
                "coordinates": [[0, 0], [1, 1]],
            },
        },
        {
            "type": "Feature",
            "properties": {"name": "tr2"},
            "temporalGeometry": {
                "type": "MovingPoint",
                "datetimes": ["2020-01-01T00:00:00", "2020-01-01T00:01:00"],
                "coordinates": [[5, 5], [6, 6]],
            },
        },
    ],
}


def test_read_movingpoint(spark):
    df = mfio.read_mf_json(spark, MOVINGPOINT, traj_id_property="id")
    rows = df.orderBy("t").collect()
    assert len(rows) == 2
    assert rows[0]["traj_id"] == "5"
    assert rows[0]["x"] == pytest.approx(116.52299)
    assert rows[0]["t"] == dt.datetime(2008, 2, 2, 15, 2, 18)
    assert rows[0]["speed"] == 1.0 and rows[1]["speed"] == 2.0


def test_read_trajectory_encoding_property_rules(spark):
    df = mfio.read_mf_json(spark, TRAJECTORY, traj_id="7")
    rows = df.orderBy("t").collect()
    assert [r["x"] for r in rows] == [0.0, 1.0, 2.0]
    assert all(r["static_attr"] == 7 for r in rows)
    assert [r["step_attr"] for r in rows] == ["a", "b", "b"]


def test_read_collection(spark):
    df = mfio.read_mf_json(spark, COLLECTION, traj_id_property="name")
    got = {r["traj_id"] for r in df.collect()}
    assert got == {"tr1", "tr2"}
    assert df.count() == 4


def test_collection_requires_id_property(spark):
    with pytest.raises(ValueError):
        mfio.read_mf_json(spark, COLLECTION)


def test_mf_json_writer_roundtrip(spark):
    df = mfio.read_mf_json(spark, COLLECTION, traj_id_property="name")
    out = q.to_mf_json(df)
    rows = {r["traj_id"]: r["mf_json"] for r in out.collect()}
    assert '"type":"MovingPoint"' in rows["tr1"]
    assert '"interpolation":"Linear"' in rows["tr1"]
    import json

    parsed = json.loads(rows["tr2"])
    assert parsed["temporalGeometry"]["coordinates"] == [[5.0, 5.0], [6.0, 6.0]]


def test_mf_json_writer_temporal_properties_roundtrip(spark):
    """Writer temporalProperties parity (reference io.py:12-110 with
    temporal_columns + temporal_columns_static_fields; mirrors the
    test_io.py gdf_to_mf_json writer cases): values group shares the
    geometry datetimes, static fields attach to the column object, and
    the reader recovers the column exactly."""
    import json

    df = mfio.read_mf_json(spark, MOVINGPOINT, traj_id_property="id")
    # MOVINGPOINT carries a temporal 'speed' column -> write it back out
    out = q.to_mf_json(
        df,
        temporal_columns=["speed"],
        temporal_columns_static_fields={"speed": {"type": "Measure", "form": "MPH"}},
    )
    feature = json.loads(out.collect()[0]["mf_json"])
    tp = feature["temporalProperties"]
    assert len(tp) == 1
    group = tp[0]
    assert group["datetimes"] == feature["temporalGeometry"]["datetimes"]
    assert group["speed"]["values"] == [1.0, 2.0]
    assert group["speed"]["type"] == "Measure" and group["speed"]["form"] == "MPH"
    # round-trip: reader reattaches the temporal column per timestamp
    back = mfio.read_mf_json(spark, feature, traj_id_property="traj_id")
    got = sorted((r["t"], r["speed"]) for r in back.collect())
    want = sorted((r["t"], r["speed"]) for r in df.collect())
    assert [v for _, v in got] == [v for _, v in want]


def test_mf_json_writer_property_columns(spark):
    """Static per-trajectory properties land in feature properties
    (reference io.py:64-75: non-temporal columns become properties)."""
    import json

    df = mfio.read_mf_json(spark, COLLECTION, traj_id_property="name")
    df = df.withColumn("vehicle", F.concat(F.lit("veh-"), "traj_id"))
    out = q.to_mf_json(df, property_columns=["vehicle"])
    feature = json.loads({r["traj_id"]: r["mf_json"] for r in out.collect()}["tr1"])
    assert feature["properties"]["vehicle"] == "veh-tr1"
