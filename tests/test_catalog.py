"""Table IO boundary (catalog.py): identifier vs path resolution; the
identifier branch is the call surface Iceberg catalogs intercept."""

from movingspark import catalog


def test_path_roundtrip(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "v")
    p = str(tmp_path / "t1")
    catalog.write_table(df, p, mode="overwrite")
    back = catalog.read_table(spark, p)
    assert back.count() == 10


def test_identifier_roundtrip_v2_writer(spark):
    df = spark.range(5).withColumnRenamed("id", "v")
    spark.sql("DROP TABLE IF EXISTS ms_cat_test")
    catalog.write_table(df, "ms_cat_test", mode="overwrite")
    assert catalog.read_table(spark, "ms_cat_test").count() == 5
    catalog.write_table(df, "ms_cat_test", mode="append")
    assert catalog.read_table(spark, "ms_cat_test").count() == 10
    spark.sql("DROP TABLE IF EXISTS ms_cat_test")


def test_is_table_identifier():
    assert catalog.is_table_identifier("iceberg.db.docs")
    assert not catalog.is_table_identifier("/data/docs.parquet")
    assert not catalog.is_table_identifier("s3://bucket/docs")


def test_bucketed_table_groupby_needs_no_exchange(spark, tmp_path):
    """Co-located layout evidence: an aggregation keyed on the bucket
    column over a bucketed table must run WITHOUT a shuffle exchange
    (the scan itself reports the hash partitioning)."""
    import re

    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") % 50).cast("string").alias("traj_id"),
        F.col("id").cast("double").alias("x"),
    )
    spark.sql("DROP TABLE IF EXISTS bucketed_pts")
    catalog.write_bucketed(df, "bucketed_pts", ["traj_id"], n_buckets=8)
    agg = catalog.read_table(spark, "bucketed_pts").groupBy("traj_id").agg(
        F.sum("x").alias("sx"), F.count("*").alias("n")
    )
    plan_buf = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_buf, plan_buf[:800]
    assert agg.count() == 50
    # identical unbucketed aggregation DOES shuffle (sanity of the assert)
    plain = df.groupBy("traj_id").agg(F.sum("x").alias("sx"))
    assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
    spark.sql("DROP TABLE IF EXISTS bucketed_pts")


def test_bucketed_plan_survives_append(spark):
    """Appending a snapshot to the bucketed table (write_bucketed with
    mode='append', matching bucket spec) must keep BOTH properties: the
    appended rows are visible, and the aggregation keyed on the bucket
    column still plans with zero exchanges."""
    from pyspark.sql import functions as F

    def mk(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 50).cast("string").alias("traj_id"),
            F.col("id").cast("double").alias("x"),
        )

    spark.sql("DROP TABLE IF EXISTS bucketed_append")
    catalog.write_bucketed(mk(0, 1000), "bucketed_append", ["traj_id"], n_buckets=8)
    catalog.write_bucketed(
        mk(1000, 1500), "bucketed_append", ["traj_id"], n_buckets=8, mode="append"
    )
    t = catalog.read_table(spark, "bucketed_append")
    assert t.count() == 1500  # appended snapshot visible
    agg = t.groupBy("traj_id").agg(F.sum("x").alias("sx"), F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:800]
    assert agg.count() == 50
    spark.sql("DROP TABLE IF EXISTS bucketed_append")


def test_replace_partitions_scoped_overwrite(spark, tmp_path):
    """replace_partitions rewrites ONLY the partitions present in the
    incoming frame — the session-catalog twin of an Iceberg
    partition-level replace commit."""
    from pyspark.sql import functions as F

    spark.sql("DROP TABLE IF EXISTS part_replace")
    base = spark.createDataFrame(
        [("d1", 1.0), ("d1", 2.0), ("d2", 3.0), ("d3", 4.0)],
        "day string, v double",
    ).select("v", "day")  # partition col LAST for insertInto ordering
    catalog.write_table(base, "part_replace", mode="overwrite", partition_by=["day"])

    patch = spark.createDataFrame([(99.0, "d2")], "v double, day string")
    catalog.replace_partitions(patch, "part_replace")

    rows = {
        (r["day"], r["v"])
        for r in catalog.read_table(spark, "part_replace").collect()
    }
    # d2 fully replaced; d1 and d3 untouched
    assert rows == {("d1", 1.0), ("d1", 2.0), ("d2", 99.0), ("d3", 4.0)}
    spark.sql("DROP TABLE IF EXISTS part_replace")
