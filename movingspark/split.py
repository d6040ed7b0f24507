"""Trajectory splitters (SURVEY.md §2.9 X2-X7).

Window-algebra splitters (gap/value-change/speed/temporal) never leave
the JVM: a boolean change flag + running sum produces the piece id
(D8 cumsum segmentation), boundary-row duplication is a filtered union.
Only AngleChangeSplitter carries loop state (the comparison direction
only updates on split) and runs as a grouped-map pandas UDF.

Naming parity: piece traj_id = "{parent_id}_{i}" with the reference's
enumeration rules (which differ subtly per splitter — see each fn).
A `parent` column keeps the original trajectory id.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from movingspark import kernels, schema
from movingspark.derive import add_direction, add_speed, traj_window
from movingspark.ingest import filter_min_length
from movingspark.schema import PointCols, TRAJ_COLS


def _finalize(df: DataFrame, piece_col, min_length: float, latlon: bool, cols: PointCols) -> DataFrame:
    """Common tail: drop <2-row pieces, stamp piece traj_id, keep parent,
    apply min_length (reference TrajectoryCollection(min_length=...),
    trajectory_collection.py:81-86)."""
    w = Window.partitionBy(cols.traj_id, piece_col)
    out = (
        df.withColumn("__n", F.count("*").over(w))
        .filter(F.col("__n") >= 2)
        .drop("__n")
        .withColumn("parent", F.col(cols.traj_id))
        .withColumn(cols.traj_id, F.concat_ws("_", cols.traj_id, F.col(piece_col).cast("string")))
        .drop(piece_col)
    )
    if min_length > 0:
        out = filter_min_length(out, min_length, latlon=latlon, cols=cols)
    return out


def split_by_observation_gap(
    df: DataFrame,
    gap_s: float,
    min_length: float = 0,
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X2 (trajectory_splitter.py:156-194): new piece when Δt > gap
    (strict); piece index counts every gap group, including ones later
    dropped for having < 2 rows."""
    w = traj_window(cols)
    dt = (F.unix_micros(F.col(cols.t)) - F.lag(F.unix_micros(F.col(cols.t))).over(w)) / 1e6
    flag = F.when(dt > gap_s, 1).otherwise(0)
    piece = F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return _finalize(df.withColumn("__piece", piece), "__piece", min_length, latlon, cols)


def split_by_speed(
    df: DataFrame,
    speed: float,
    duration_s: float,
    min_length: float = 0,
    max_speed: float = float("inf"),
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X4 (trajectory_splitter.py:197-228): keep rows with speed within
    [speed, max_speed] (inclusive), then gap-split with gap=duration."""
    has_speed = schema.SPEED in df.columns
    if not has_speed:
        df = add_speed(df, latlon=latlon, cols=cols)
    df = df.filter((F.col(schema.SPEED) >= speed) & (F.col(schema.SPEED) <= max_speed))
    if not has_speed:
        df = df.drop(schema.SPEED)
    return split_by_observation_gap(df, duration_s, min_length, latlon, cols)


def split_by_value_change(
    df: DataFrame,
    col_name: str,
    min_length: float = 0,
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X7 (trajectory_splitter.py:346-390): new piece when `col_name`
    changes between consecutive rows; each non-last piece additionally
    receives the NEXT piece's first row (boundary continuity), applied
    BEFORE the 2-row validity check (so a 1-row piece + boundary row
    survives)."""
    w = traj_window(cols)
    prev = F.lag(col_name).over(w)
    rn = F.row_number().over(w)
    # pandas semantics: NaN != anything (incl. NaN) is True
    changed = F.when(rn == 1, 0).when(
        F.col(col_name).isNull() | prev.isNull(), 1
    ).otherwise((F.col(col_name) != prev).cast("int"))
    piece = F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0))
    base = df.withColumn("__piece", piece)

    first_of_piece = F.row_number().over(Window.partitionBy(cols.traj_id, "__piece").orderBy(cols.t))
    boundary = (
        base.withColumn("__fr", first_of_piece)
        .filter((F.col("__fr") == 1) & (F.col("__piece") > 0))
        .drop("__fr")
        .withColumn("__piece", F.col("__piece") - 1)
    )
    return _finalize(base.unionByName(boundary), "__piece", min_length, latlon, cols)


def split_temporally(
    df: DataFrame,
    mode: str = "day",
    min_length: float = 0,
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X3 (trajectory_splitter.py:100-153): bucket rows by calendar
    period (hour/day/month/year) OR any raw fixed-frequency alias the
    reference forwards to pd.Grouper(freq=...) — e.g. "2h", "15min",
    "30s" (trajectory_splitter.py:117-120). Raw frequencies replicate
    the Grouper default origin='start_day': bins are anchored at
    midnight of each trajectory's first observation day (a per-traj
    window min — no extra shuffle beyond the splitter's own window).
    Piece index enumerates the NON-EMPTY buckets of each trajectory;
    each non-last piece receives the next piece's first row before the
    2-row validity check."""
    if mode in {"hour", "day", "month", "year"}:
        bucket = F.date_trunc(mode, F.col(cols.t))
    else:
        m = re.fullmatch(r"(\d*)\s*(s|sec|second|min|t|h|hour|d)", mode.strip(), re.IGNORECASE)
        if not m:
            raise ValueError(
                f"unsupported temporal split mode: {mode!r} "
                "(named: hour/day/month/year; raw tick aliases: e.g. '2h', '15min', '30s')"
            )
        n = int(m.group(1) or 1)
        unit_us = {
            "s": 1_000_000, "sec": 1_000_000, "second": 1_000_000,
            "min": 60_000_000, "t": 60_000_000,
            "h": 3_600_000_000, "hour": 3_600_000_000,
            "d": 86_400_000_000,
        }[m.group(2).lower()]
        freq_us = n * unit_us
        origin = F.unix_micros(F.date_trunc("day", F.min(cols.t).over(Window.partitionBy(cols.traj_id))))
        bucket = F.floor((F.unix_micros(F.col(cols.t)) - origin) / F.lit(freq_us))
    base = df.withColumn("__bucket", bucket)
    idx = F.dense_rank().over(Window.partitionBy(cols.traj_id).orderBy("__bucket")) - 1
    base = base.withColumn("__piece", idx).drop("__bucket")

    first_of_piece = F.row_number().over(Window.partitionBy(cols.traj_id, "__piece").orderBy(cols.t))
    boundary = (
        base.withColumn("__fr", first_of_piece)
        .filter((F.col("__fr") == 1) & (F.col("__piece") > 0))
        .drop("__fr")
        .withColumn("__piece", F.col("__piece") - 1)
    )
    return _finalize(base.unionByName(boundary), "__piece", min_length, latlon, cols)


def angle_change_groups(dirs, spds, min_angle: float, min_speed: float) -> np.ndarray:
    """Sequential group assignment for X6: comp_dir updates only when a
    split fires. Module-level so the pinned-oracle generator runs the
    SAME code single-process (tools/gen_pinned_oracles.py)."""
    comp_dir = dirs[0]
    group = 0
    groups = np.zeros(len(dirs), dtype=np.int64)
    for i in range(len(dirs)):
        if spds[i] >= min_speed:
            if kernels.angular_difference(comp_dir, dirs[i]) >= min_angle:
                comp_dir = dirs[i]
                group += 1
        groups[i] = group
    return groups


def split_by_angle_change(
    df: DataFrame,
    min_angle: float = 45,
    min_speed: float = 0,
    min_length: float = 0,
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X6 (trajectory_splitter.py:273-343): carried comparison direction
    comp_dir updates only when a split fires (speed >= min_speed AND
    angular_difference(comp_dir, direction) >= min_angle) — inherently
    sequential, so a grouped-map pandas UDF with the loop in numpy.
    Each piece with >1 rows gets the previous piece's LAST row prepended
    (i > 0); 1-row pieces are dropped before prepending."""
    had_dir = schema.DIRECTION in df.columns
    had_speed = schema.SPEED in df.columns
    if not had_dir:
        df = add_direction(df, latlon=latlon, cols=cols)
    if not had_speed:
        df = add_speed(df, latlon=latlon, cols=cols)

    out_fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join(out_fields + ["parent string"])
    tcol, dircol, spcol = cols.traj_id, schema.DIRECTION, schema.SPEED

    def per_traj(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(cols.t).reset_index(drop=True)
        groups = angle_change_groups(
            pdf[dircol].to_numpy(float), pdf[spcol].to_numpy(float), min_angle, min_speed
        )
        tid = pdf[tcol].iloc[0]
        pieces = []
        bounds = np.flatnonzero(np.diff(groups)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pdf)]])
        for i, (s, e) in enumerate(zip(starts, ends)):
            if e - s <= 1:
                continue
            piece = pdf.iloc[s:e]
            if i > 0:
                piece = pd.concat([pdf.iloc[starts[i - 1] + (ends[i - 1] - starts[i - 1]) - 1 : ends[i - 1]], piece])
            piece = piece.copy()
            piece["parent"] = tid
            piece[tcol] = f"{tid}_{i}"
            pieces.append(piece)
        if not pieces:
            return pdf.iloc[0:0].assign(parent=pd.Series(dtype=str))
        return pd.concat(pieces, ignore_index=True)

    from movingspark.gmap import grouped_apply_sorted

    out = grouped_apply_sorted(df, per_traj, out_schema, cols)
    if not had_dir:
        out = out.drop(schema.DIRECTION)
    if not had_speed:
        out = out.drop(schema.SPEED)
    if min_length > 0:
        out = filter_min_length(out, min_length, latlon=latlon, cols=cols)
    return out


def split_by_stops(
    df: DataFrame,
    max_diameter: float,
    min_duration_s: float,
    min_length: float = 0,
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X5 (trajectory_splitter.py:231-270): detect stops (X1), take the
    complement time ranges [start..stop1.t0], [stop1.tn..stop2.t0], ...,
    [stopK.tn..end], slice inclusive segments, drop invalid (<2 rows)
    pieces; piece traj_id = "{id}_{range_start}" (get_segment_between
    naming, trajectory.py:974)."""
    from movingspark.stops import get_stop_time_ranges

    stops = get_stop_time_ranges(df, max_diameter, min_duration_s, latlon, cols)

    extent = df.groupBy(cols.traj_id).agg(
        F.min(cols.t).alias("t_first"), F.max(cols.t).alias("t_last")
    )
    # complement ranges: pair boundary instants in time order
    b_start = extent.select(cols.traj_id, F.col("t_first").alias("edge"), F.lit(0).alias("kind"))
    b_end = extent.select(cols.traj_id, F.col("t_last").alias("edge"), F.lit(1).alias("kind"))
    s0 = stops.select(F.col("traj_id").alias(cols.traj_id), F.col("start_t").alias("edge"), F.lit(1).alias("kind"))
    s1 = stops.select(F.col("traj_id").alias(cols.traj_id), F.col("end_t").alias("edge"), F.lit(0).alias("kind"))
    edges = b_start.unionByName(s0).unionByName(s1).unionByName(b_end)
    w = Window.partitionBy(cols.traj_id).orderBy("edge", "kind")
    ranges = (
        edges.withColumn("__rn", F.row_number().over(w))
        .withColumn("nxt", F.lead("edge").over(w))
        .filter(F.col("__rn") % 2 == 1)  # odd rows open a between-stops range
        .select(
            F.col(cols.traj_id).alias("traj_id"),
            F.col("edge").alias("start_t"),
            F.col("nxt").alias("end_t"),
        )
        .filter(F.col("end_t").isNotNull())
    )

    from movingspark.stops import attach_ranges

    seg = attach_ranges(df, ranges, cols)
    wp = Window.partitionBy(cols.traj_id, "start_t")
    out = (
        seg.withColumn("__n", F.count("*").over(wp))
        .withColumn("__span", (F.max(cols.t).over(wp) > F.min(cols.t).over(wp)).cast("int"))
        .filter((F.col("__n") >= 2) & (F.col("__span") == 1))
        .withColumn("parent", F.col(cols.traj_id))
        .withColumn(
            cols.traj_id,
            F.concat_ws("_", cols.traj_id, F.date_format("start_t", "yyyy-MM-dd HH:mm:ss")),
        )
        .drop("start_t", "end_t", "__n", "__span")
    )
    if min_length > 0:
        out = filter_min_length(out, min_length, latlon=latlon, cols=cols)
    return out
