"""MF-JSON reader/writer (SURVEY.md §2.1 S3/S4; reference io.py:12-335,
OGC Moving Features Encoding, http://www.opengis.net/doc/BP/mf-json/1.0).

Reader: Feature (MovingPoint temporalGeometry or LineString Trajectory
encoding) and FeatureCollection documents -> the canonical point table.
Distributed path: spark.read.json + explode(arrays_zip(datetimes,
coordinates)); temporal properties attach with the spec's length rules
(n -> per-point, n-1 -> step interpolation with last repeated, 1 ->
static attribute).

Writer: queries.to_mf_json (groupBy + collect_list + to_json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_mf_json(
    spark: SparkSession,
    path_or_dict,
    traj_id_property: str | None = None,
    traj_id="0",
) -> DataFrame:
    """Read an MF-JSON file (or already-parsed dict) into the canonical
    point table (traj_id, t, x, y, <properties...>)."""
    if isinstance(path_or_dict, str):
        import json as _json

        with open(path_or_dict) as f:
            data = _json.loads(f.read())
    else:
        data = path_or_dict

    if data.get("type") == "Feature" and "temporalGeometry" in data:
        rows, cols = _movingpoint_rows(data, traj_id_property, traj_id)
    elif data.get("type") == "Feature" and "geometry" in data:
        rows, cols = _trajectory_rows(data, traj_id)
    elif data.get("type") == "FeatureCollection" and "features" in data:
        if traj_id_property is None:
            raise ValueError("traj_id_property must be supplied for collections")
        rows, cols = [], None
        for feat in data["features"]:
            r, cols = _movingpoint_rows(feat, traj_id_property, None)
            rows.extend(r)
    else:
        raise ValueError("Not a supported MovingFeatures JSON")

    df = spark.createDataFrame(rows, cols)
    return df.withColumn("t", F.to_timestamp("t")).withColumn(
        "traj_id", F.col("traj_id").cast("string")
    )


def _movingpoint_rows(data, traj_id_property, traj_id):
    tg = data["temporalGeometry"]
    if tg["type"] != "MovingPoint":
        raise ValueError(f"temporalGeometry type must be MovingPoint, got {tg['type']}")
    times = tg["datetimes"]
    coords = tg["coordinates"]
    if traj_id_property:
        props = data.get("properties", {})
        if traj_id_property not in props:
            raise ValueError(f"No property {traj_id_property!r}")
        traj_id = props[traj_id_property]

    extra_cols: dict[str, list] = {}
    for group in data.get("temporalProperties", []):
        gt = group.get("datetimes", times)
        for key, spec in group.items():
            if key == "datetimes":
                continue
            vals = spec["values"]
            by_t = dict(zip(gt, vals))
            extra_cols[key] = [by_t.get(t) for t in times]

    # plain feature properties attach by the spec length rules (io.py:240-263)
    for key, vals in (data.get("properties") or {}).items():
        if key in ("datetimes",) or key == traj_id_property:
            continue
        if isinstance(vals, list):
            if len(vals) == len(times):
                extra_cols[key] = vals
            elif len(vals) == len(times) - 1:
                extra_cols[key] = vals + [vals[-1]]
            elif len(vals) == 1:
                extra_cols[key] = vals * len(times)
        else:
            extra_cols[key] = [vals] * len(times)

    names = ["traj_id", "t", "x", "y", *extra_cols.keys()]
    rows = [
        tuple(
            [str(traj_id), times[i], float(coords[i][0]), float(coords[i][1])]
            + [extra_cols[k][i] for k in extra_cols]
        )
        for i in range(len(times))
    ]
    return rows, names


def _trajectory_rows(data, traj_id):
    geom = data["geometry"]
    if geom["type"] != "LineString":
        raise ValueError(f"geometry type must be LineString, got {geom['type']}")
    props = data.get("properties", {})
    times = props["datetimes"]
    coords = geom["coordinates"]

    extra_cols = {}
    for key, vals in props.items():
        if key == "datetimes":
            continue
        if isinstance(vals, list):
            if len(vals) == len(times):
                extra_cols[key] = vals
            elif len(vals) == len(times) - 1:
                extra_cols[key] = vals + [vals[-1]]
            elif len(vals) == 1:
                extra_cols[key] = vals * len(times)
        else:
            extra_cols[key] = [vals] * len(times)

    names = ["traj_id", "t", "x", "y", *extra_cols.keys()]
    rows = [
        tuple(
            [str(traj_id), times[i], float(coords[i][0]), float(coords[i][1])]
            + [extra_cols[k][i] for k in extra_cols]
        )
        for i in range(len(times))
    ]
    return rows, names


def read_mf_json_distributed(spark: SparkSession, path: str, traj_id_property: str) -> DataFrame:
    """Scale path: a directory/glob of FeatureCollection or
    newline-delimited Feature JSON documents read with spark.read.json
    and exploded JVM-side — no driver-side parsing."""
    raw = spark.read.option("multiLine", "true").json(path)
    if "features" in raw.columns:
        feats = raw.select(F.explode("features").alias("f"))
    else:
        feats = raw.select(F.struct(*raw.columns).alias("f"))
    zipped = F.arrays_zip(
        F.col("f.temporalGeometry.datetimes").alias("t"),
        F.col("f.temporalGeometry.coordinates").alias("c"),
    )
    return feats.select(
        F.col(f"f.properties.{traj_id_property}").cast("string").alias("traj_id"),
        F.explode(zipped).alias("z"),
    ).select(
        "traj_id",
        F.to_timestamp(F.col("z.t")).alias("t"),
        F.col("z.c")[0].cast("double").alias("x"),
        F.col("z.c")[1].cast("double").alias("y"),
    )
