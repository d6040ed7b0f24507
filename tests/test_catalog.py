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
