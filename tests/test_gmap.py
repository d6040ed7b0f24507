"""grouped_apply_sorted must equal groupBy().applyInPandas exactly,
including when a single trajectory spans MULTIPLE Arrow batches (the
batch-boundary carry path, and its transitive case: a group larger
than two batches). Kernels are defined inside the tests so cloudpickle
ships them by value to the workers."""

import pandas as pd

from movingspark.gmap import grouped_apply_sorted

SCHEMA = "traj_id string, n long, x_first double, x_last double, y_sum double"


def _mk_points(spark, n_trajs=7, rows_per=23):
    rows = []
    for tid in range(n_trajs):
        for i in range(rows_per):
            rows.append(
                (str(tid), f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", float(tid * 100 + i), float(i % 5))
            )
    pdf = pd.DataFrame(rows, columns=["traj_id", "t", "x", "y"])
    pdf["t"] = pd.to_datetime(pdf["t"])
    return spark.createDataFrame(pdf)


def test_grouped_apply_matches_applyinpandas_tiny_arrow_batches(spark):
    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        return pd.DataFrame(
            {
                "traj_id": [pdf["traj_id"].iloc[0]],
                "n": [len(pdf)],
                "x_first": [float(pdf["x"].iloc[0])],
                "x_last": [float(pdf["x"].iloc[-1])],
                "y_sum": [float(pdf["y"].sum())],
            }
        )

    df = _mk_points(spark)
    expected = sorted(
        map(tuple, df.groupBy("traj_id").applyInPandas(summarize, SCHEMA).collect())
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        # 23-row groups over 7-row batches: every group spans >=3 batches,
        # exercising the transitive carry (whole-batch single-group case)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        got = sorted(map(tuple, grouped_apply_sorted(df, summarize, SCHEMA).collect()))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == expected
    assert len(got) == 7 and all(r[1] == 23 for r in got)


def test_grouped_apply_filters_and_empty_groups(spark):
    def drop_evens(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["traj_id"].iloc[0] == "2":
            return pdf.iloc[0:0]  # empty result for one group
        return pdf[pdf["y"] % 2 == 0]

    df = _mk_points(spark, n_trajs=4, rows_per=9)
    schema = df.schema
    expected = sorted(
        map(tuple, df.groupBy("traj_id").applyInPandas(drop_evens, schema).collect())
    )
    got = sorted(map(tuple, grouped_apply_sorted(df, drop_evens, schema).collect()))
    assert got == expected
    assert not any(r[0] == "2" for r in got)
