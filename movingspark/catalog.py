"""Table IO boundary: path-addressable parquet today, Iceberg-ready.

The north rule targets Iceberg tables of interleaved documents; every
engine operator takes/returns DataFrames, so table format is strictly a
boundary concern. `read_table`/`write_table` resolve either

- a CATALOG IDENTIFIER (`catalog.db.table`) via `spark.read.table` /
  `DataFrameWriterV2` — exactly how Iceberg tables appear once a
  catalog is configured (public Iceberg runtime config:
  `spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`
  plus the `iceberg-spark-runtime` jar on the cluster classpath); or
- a FILESYSTEM PATH via `spark.read.parquet` (this sandbox ships no
  Iceberg jar, so tests exercise the identifier branch against Spark's
  built-in session catalog — the same calls Iceberg intercepts).

Writes use the V2 writer for identifiers (`createOrReplace` /
`append`), which maps onto Iceberg's atomic snapshot commits, and the
classic parquet writer for paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_identifier(ref: str) -> bool:
    """Heuristic boundary: a filesystem path contains '/' (or a URI
    scheme); a table identifier is dot-separated names."""
    return "/" not in ref and "\\" not in ref and ":" not in ref


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if is_table_identifier(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """mode: 'append' | 'overwrite'. Identifier writes go through the
    DataFrameWriterV2 (atomic replace / append — Iceberg snapshot
    semantics); path writes through the parquet writer."""
    if is_table_identifier(ref):
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode {mode!r}")
        w = df.writeTo(ref)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        try:
            if mode == "overwrite":
                w.createOrReplace()
            else:
                try:
                    w.append()
                except Exception:
                    # first write to a not-yet-existing table
                    w.create()
        except Exception:
            # V2 writer path (what Iceberg catalogs implement); the
            # built-in V1 session catalog lacks REPLACE TABLE AS SELECT
            # -> fall back to the classic saveAsTable
            writer = df.write.mode(mode)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.saveAsTable(ref)
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(ref)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a table hash-BUCKETED by `bucket_cols` (optionally
    sorted within buckets): every downstream join or aggregation keyed
    on the bucket columns reads pre-co-located data and skips its
    exchange entirely — the 100 TB answer to 'this pipeline groups by
    traj_id/doc_id at every stage'. Bucket count is a physical layout
    choice: pick ~(total size / target partition size), NOT the
    cluster's current core count.

    Uses the V1 `bucketBy().saveAsTable()` API (bucketing requires a
    table identifier — raw parquet paths carry no bucket metadata). On
    an Iceberg catalog the equivalent layout is the `bucket(n, col)`
    partition transform via write_table(partition_by=...)."""
    if not is_table_identifier(table):
        raise ValueError("bucketed writes need a table identifier, not a path")
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def replace_partitions(df: DataFrame, table: str) -> None:
    """Partition-scoped overwrite: only the partitions PRESENT in `df`
    are replaced; every other partition's data survives untouched. This
    is the session-catalog twin of an Iceberg partition-level replace
    commit (REPLACE WHERE / dynamic overwrite) — the idiom a 100 TB
    pipeline uses to re-run one day/one region without rewriting the
    table. Implemented with Spark's dynamic partitionOverwriteMode so
    the same call works unchanged when the identifier resolves to an
    Iceberg catalog (which honors dynamic overwrite natively)."""
    if not is_table_identifier(table):
        raise ValueError("partition replace needs a table identifier, not a path")
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").insertInto(table)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
