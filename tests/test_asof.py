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
