"""Distributed as-of join (nearest earlier observation per key).

Joins every left row to the latest right row with the same key and
`t_right <= t_left` (optionally within a tolerance) — the classic
time-series enrichment join Spark's DataFrame API lacks. Trajectory
use cases: attach the most recent sensor reading / port call / status
event to each GPS fix (the reference does per-object pandas
`merge_asof`-style lookups inside `get_row_at`, trajectory.py:787-830,
one object at a time; this is that lookup distributed over every left
row at once).

Execution shape — the union-ffill formulation, not a join:
tag both inputs, UNION ALL, then one window per key ordered by
(t, side) forward-fills the right payload onto every left row. That is
a single hash exchange on the key + one sort — no join node at all, so
there is nothing to broadcast, no range-explosion, and skew follows the
key cardinality exactly like any window (AQE-salvageable). A
sort-merge formulation would shuffle BOTH sides the same way and then
pay a join; the union path pays the identical shuffle and a linear
scan. Right rows must be unique per (key, t) for deterministic output
(pre-aggregate if not); at equal timestamps the right row sorts first,
so `t_right = t_left` matches (inclusive semantics, same as DuckDB's
`ASOF JOIN ... ON l.t >= r.t`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    t: str,
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join `left` to the latest `right` row per `key` with
    right.t <= left.t (inclusive; within `tolerance_s` seconds if set).

    Returns every left row (left outer semantics) with all non-key
    right columns appended as `<col><suffix>`, plus `t<suffix>` for the
    matched right timestamp — all NULL when no right row qualifies.
    """
    rcols = [c for c in right.columns if c not in (key, t)]
    out_r = [f"{c}{suffix}" for c in rcols] + [f"{t}{suffix}"]

    lt = left.select(
        F.col(key).alias("__k"),
        F.col(t).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rcols + [t]])).schema[0].dataType
        ).alias("__r"),
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(t).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns])).schema[0].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in rcols + [t]]).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        lt.unionByName(rt)
        .withColumn("__rf", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_s is not None:
        tol_us = int(round(tolerance_s * 1_000_000))
        in_tol = (
            F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__rf")[t])
        ) <= F.lit(tol_us)
        filled = filled.withColumn(
            "__rf", F.when(in_tol, F.col("__rf")).otherwise(F.lit(None))
        )
    sel = [F.col("__l")[c].alias(c) for c in left.columns]
    sel += [F.col("__rf")[c].alias(f"{c}{suffix}") for c in rcols]
    sel.append(F.col("__rf")[t].alias(f"{t}{suffix}"))
    return filled.select(*sel)
