import datetime as dt

from movingspark.asof import asof_join

E = dt.datetime(2024, 1, 1)


def _ts(s):
    return E + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts(5), 1.0),
            ("a", _ts(10), 2.0),
            ("a", _ts(2), 0.5),
            ("b", _ts(7), 9.0),
        ],
        "k string, t timestamp, lv double",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(3), "r1"),
            ("a", _ts(10), "r2"),
            ("b", _ts(8), "r3"),
        ],
        "k string, t timestamp, rv string",
    )
    return left, right


def test_asof_basic_latest_earlier_inclusive(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], (r["t"] - E).total_seconds()): (r["rv_r"], r["t_r"])
        for r in asof_join(left, right, "k", "t").collect()
    }
    assert len(out) == 4
    assert out[("a", 2.0)] == (None, None)  # nothing at or before t=2
    assert out[("a", 5.0)] == ("r1", _ts(3))
    assert out[("a", 10.0)] == ("r2", _ts(10))  # equal timestamp matches
    assert out[("b", 7.0)] == (None, None)  # right row is later


def test_asof_tolerance_nulls_out_stale_match(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], (r["t"] - E).total_seconds()): r["rv_r"]
        for r in asof_join(left, right, "k", "t", tolerance_s=1.5).collect()
    }
    assert out[("a", 5.0)] is None  # r1 is 2 s stale, beyond 1.5 s
    assert out[("a", 10.0)] == "r2"  # 0 s stale


def test_asof_left_columns_untouched(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], (r["t"] - E).total_seconds()): r["lv"]
        for r in asof_join(left, right, "k", "t").collect()
    }
    assert got == {("a", 2.0): 0.5, ("a", 5.0): 1.0, ("a", 10.0): 2.0, ("b", 7.0): 9.0}


def test_asof_single_exchange_no_join(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, "k", "t")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # key hash exchange (x2 union legs pre-AQE merge)


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Independent ground truth: pandas.merge_asof (backward, inclusive)
    on randomized keys/timestamps, including duplicate left timestamps
    and keys with no right rows."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    keys = [f"k{i}" for i in range(6)]
    left_pd = pd.DataFrame(
        {
            "k": rng.choice(keys, 80),
            "t": pd.to_datetime(rng.integers(0, 10_000, 80), unit="s"),
            "lv": rng.normal(size=80),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.choice(keys[:4], 50),  # k4,k5 have no right rows
            "t": pd.to_datetime(rng.integers(0, 10_000, 50), unit="s"),
            "rv": np.arange(50.0),
        }
    ).drop_duplicates(["k", "t"])  # operator contract: unique (key, t)

    expect = pd.merge_asof(
        left_pd.sort_values("t", kind="mergesort").reset_index(drop=True),
        right_pd.sort_values("t", kind="mergesort").reset_index(drop=True),
        on="t", by="k", direction="backward", suffixes=("", "_r"),
    )
    got = asof_join(
        spark.createDataFrame(left_pd), spark.createDataFrame(right_pd), "k", "t"
    ).toPandas()

    key = lambda df: df.sort_values(["k", "t", "lv"], kind="mergesort").reset_index(drop=True)
    e, g = key(expect), key(got)
    assert len(e) == len(g)
    assert (e["rv"].fillna(-1).to_numpy() == g["rv_r"].fillna(-1).to_numpy()).all()
