"""Grouped-map execution without per-group dispatch overhead.

The sequential per-trajectory kernels (stop detector, generalizers,
Kalman, angle split, overlay clip, hulls...) are all "one pandas
function per traj_id group". Spark's groupBy().applyInPandas pays
per-GROUP machinery (plan node per group invocation, Arrow slice,
schema coercion) that dominates wall time when groups are small
(~70-row groups at sf0.1: ~2/3 of the overlay clip's time was
dispatch, not kernel).

`grouped_apply_sorted` runs the same per-group function as ONE
mapInPandas pass over partitions hash-partitioned and sorted by
(key, order): group boundaries are found with a numpy scan, the last
(possibly incomplete) group of each Arrow batch is carried into the
next batch, and each batch yields a single concatenated frame. The
shuffle cost is identical to applyInPandas (same hash exchange); only
the Python-side dispatch changes. At 100 TB this matters more, not
less: group count grows with data while per-group size stays bounded,
so per-group overhead scales with the dominant term.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from movingspark.schema import TRAJ_COLS, PointCols


def grouped_apply_sorted(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
    cols: PointCols = TRAJ_COLS,
    key: str | None = None,
    order: str | None = None,
) -> DataFrame:
    """Semantically equivalent to
    ``df.groupBy(key).applyInPandas(fn, schema)`` for a per-group pure
    function, executed as mapInPandas over (key, order)-sorted hash
    partitions with a batch-boundary carry. `fn` receives each group
    with a reset index, rows pre-sorted by `order` (kernels that
    re-sort internally stay correct and cheap — sorting sorted data).

    Known trade-offs vs applyInPandas (both acceptable here): the
    explicit repartition is not elided when the input is already
    hash-partitioned on `key` (FlatMapGroupsInPandas declares a
    ClusteredDistribution that Catalyst can satisfy without a shuffle;
    RepartitionByExpression is unconditional) — none of this engine's
    pipelines chain two grouped-map kernels without an intervening
    exchange, so nothing regresses; and one pathological giant group
    still lands on a single task, exactly as it does with
    applyInPandas (inherent to per-group sequential semantics)."""
    key = key or cols.traj_id
    order = order or cols.t

    def per_batch(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            keys = pdf[key].to_numpy()
            boundary = np.nonzero(keys[1:] != keys[:-1])[0] + 1
            starts = np.concatenate([[0], boundary])
            # hold back the final group — it may continue in the next batch
            carry = pdf.iloc[starts[-1]:]
            outs = [
                fn(pdf.iloc[s:e].reset_index(drop=True))
                for s, e in zip(starts[:-1], starts[1:])
            ]
            outs = [o for o in outs if len(o)]
            if outs:
                yield pd.concat(outs, ignore_index=True)
        if carry is not None and len(carry):
            out = fn(carry.reset_index(drop=True))
            if len(out):
                yield out

    # Explicit partition count: repartition(key) alone lets AQE coalesce
    # by SHUFFLE BYTES, which is miscalibrated for a CPU-bound Python
    # stage — at sf0.1 it folded 1500 trajectory groups onto 3 tasks and
    # tripled overlay-clip wall time. Passing N pins the exchange to the
    # configured shuffle parallelism (the operator's unit of CPU, not
    # bytes); on a real cluster shuffle.partitions is sized to the job,
    # so this keeps the configured intent at every scale.
    spark = df.sparkSession
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = spark.sparkContext.defaultParallelism
    return (
        df.repartition(n_parts, key)
        .sortWithinPartitions(key, order)
        .mapInPandas(per_batch, schema=schema)
    )
