import datetime as dt

import pytest

from movingspark.proximity import proximity_pairs

E = dt.datetime(2024, 1, 1)
BOUNDS = (0.0, 0.0, 16.0, 16.0)
RES = 3  # 8x8 cells of 2x2


def _ts(s):
    return E + dt.timedelta(seconds=s)


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "traj_id string, t timestamp, x double, y double"
    )


def test_proximity_basic_and_cross_boundary(spark):
    # a-b: contact straddling the cell boundary at x=2 (1.9 vs 2.05,
    #      different home cells) and 10 s apart — must be found.
    # a-c: spatially close but 500 s apart — excluded by time.
    # a-d: temporally close but 10 units away — excluded by distance.
    df = _pts(
        spark,
        [
            ("a", _ts(0), 1.9, 1.0),
            ("b", _ts(10), 2.05, 1.0),
            ("c", _ts(500), 1.9, 1.0),
            ("d", _ts(5), 11.9, 1.0),
        ],
    )
    rows = proximity_pairs(df, max_dist=1.0, max_dt_s=60.0, res=RES, bounds=BOUNDS).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["traj_a"], r["traj_b"], r["n_contacts"]) == ("a", "b", 1)
    assert r["min_dist"] == pytest.approx(0.15)


def test_proximity_no_duplicate_candidates_and_counts(spark):
    # two trajectories tracking each other for 3 ticks -> n_contacts
    # counts qualifying POINT pairs exactly once each (no replication
    # double-count): ticks 0/10/20 s within 60 s of each other => all
    # 3x3 = 9 cross pairs qualify on time; distance keeps all 9.
    rows = []
    for k in range(3):
        rows.append(("a", _ts(10 * k), 5.0 + 0.1 * k, 5.0))
        rows.append(("b", _ts(10 * k + 3), 5.25 + 0.1 * k, 5.0))
    df = _pts(spark, rows)
    out = proximity_pairs(df, max_dist=1.5, max_dt_s=60.0, res=RES, bounds=BOUNDS).collect()
    assert len(out) == 1
    assert out[0]["n_contacts"] == 9
    # dx over the 9 cross pairs is 0.25 + 0.1*(j-k), minimized at j-k=-2
    assert out[0]["min_dist"] == pytest.approx(0.05)


def test_proximity_same_traj_excluded_and_ordering(spark):
    df = _pts(
        spark,
        [
            ("z", _ts(0), 3.0, 3.0),
            ("z", _ts(1), 3.1, 3.0),  # same traj: never a pair
            ("a", _ts(2), 3.05, 3.0),
        ],
    )
    out = proximity_pairs(df, max_dist=1.0, max_dt_s=60.0, res=RES, bounds=BOUNDS).collect()
    assert len(out) == 1
    assert (out[0]["traj_a"], out[0]["traj_b"]) == ("a", "z")  # lexicographic
    assert out[0]["n_contacts"] == 2  # a meets both z points


def test_proximity_guards(spark):
    df = _pts(spark, [("a", _ts(0), 1.0, 1.0)])
    with pytest.raises(ValueError):
        proximity_pairs(df, max_dist=3.0, max_dt_s=60.0, res=RES, bounds=BOUNDS)
    with pytest.raises(ValueError):
        proximity_pairs(df, max_dist=1.0, max_dt_s=0.0, res=RES, bounds=BOUNDS)


def test_proximity_plan_shuffle_hash_no_cartesian(spark):
    # the static planner mis-broadcasts the 27x replicated side if left
    # alone (it cannot estimate post-explode cardinality); the hint must
    # hold the scale-safe shape: a shuffled hash join on the bucket key,
    # never a cartesian product.
    df = _pts(spark, [("a", _ts(0), 1.0, 1.0), ("b", _ts(1), 1.2, 1.0)])
    plan = (
        proximity_pairs(df, max_dist=1.0, max_dt_s=60.0, res=RES, bounds=BOUNDS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "ShuffledHashJoin" in plan


def test_proximity_matches_bruteforce_randomized(spark):
    """Randomized parity vs an O(n^2) numpy brute force — exercises
    bucket-boundary contacts, multi-contact pairs and empty results."""
    import numpy as np

    rng = np.random.default_rng(23)
    n = 120
    trajs = rng.integers(0, 12, n)
    xs = rng.uniform(0, 16, n)
    ys = rng.uniform(0, 16, n)
    tss = rng.integers(0, 3000, n)
    rows = [
        (f"t{trajs[i]:02d}", _ts(int(tss[i]) + i * 1e-3), float(xs[i]), float(ys[i]))
        for i in range(n)  # +i ms: unique (traj, t) per the point-table contract
    ]
    df = _pts(spark, rows)
    max_dist, tol = 1.5, 120.0
    got = {
        (r["traj_a"], r["traj_b"]): (r["n_contacts"], r["min_dist"])
        for r in proximity_pairs(df, max_dist, tol, res=RES, bounds=BOUNDS).collect()
    }

    t_us = (tss * 1_000_000 + np.arange(n) * 1000).astype(np.int64)
    expect = {}
    for i in range(n):
        for j in range(n):
            a, b = f"t{trajs[i]:02d}", f"t{trajs[j]:02d}"
            if not a < b:
                continue
            if abs(int(t_us[i]) - int(t_us[j])) > tol * 1e6:
                continue
            d = float(np.hypot(xs[i] - xs[j], ys[i] - ys[j]))
            if d * d > max_dist * max_dist:
                continue
            c, m = expect.get((a, b), (0, np.inf))
            expect[(a, b)] = (c + 1, min(m, d))
    assert set(got) == set(expect)
    for k, (c, m) in expect.items():
        assert got[k][0] == c, k
        assert got[k][1] == pytest.approx(m, rel=1e-12), k
