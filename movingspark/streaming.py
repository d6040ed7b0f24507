"""Structured Streaming extensions (SURVEY.md §2.11).

The reference is batch-only; these are the natural streaming analogues
the engine adds:

- session-window gap segmentation: ObservationGapSplitter (X2) is
  exactly session windowing with a gap timeout — `session_window(t,
  gap)` works identically over batch DataFrames and readStream sources.
- streaming tile rollup: watermarked per-cell tumbling-window counts —
  the incremental form of joins.tile_rollup for late-arriving points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movingspark.cells import WORLD, cell_id_expr
from movingspark.schema import PointCols, TRAJ_COLS


def gap_sessions(df: DataFrame, gap: str = "1 hour", cols: PointCols = TRAJ_COLS) -> DataFrame:
    """Per-trajectory observation sessions with the given gap timeout —
    the session-window rendition of X2 (one row per contiguous burst of
    observations). Works on both batch and streaming inputs."""
    return (
        df.groupBy(cols.traj_id, F.session_window(cols.t, gap).alias("session"))
        .agg(
            F.count("*").alias("n"),
            F.min(cols.t).alias("start_t"),
            F.max(cols.t).alias("end_t"),
        )
        .select(
            cols.traj_id,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n",
            "start_t",
            "end_t",
        )
    )


def streaming_tile_rollup(
    stream: DataFrame,
    res: int,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    bounds=WORLD,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """Watermarked streaming tile rollup: per (cell, time window) point
    counts; late data beyond the watermark is dropped by the engine.
    Attach to a readStream source and writeStream sink:

        (streaming_tile_rollup(src, res=6)
           .writeStream.outputMode("update").format("memory")...)
    """
    tagged = stream.withWatermark(cols.t, watermark).withColumn(
        "cell", cell_id_expr(F.col(cols.x), F.col(cols.y), res, bounds)
    )
    return tagged.groupBy("cell", F.window(cols.t, window).alias("w")).agg(
        F.count("*").alias("n_points")
    ).select("cell", F.col("w.start").alias("window_start"), "n_points")
