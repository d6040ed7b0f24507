"""Convoy / co-movement detection (movingspark/convoy.py)."""

import numpy as np
import pytest

from movingspark import convoy
from tests.conftest import rows_to_points

BOUNDS = (0.0, 0.0, 256.0, 128.0)
DAY = 86400.0


def _day(d, hh=12):
    return f"2020-01-{d:02d}T{hh:02d}:00:00"


def test_convoy_pairs_consecutive_run_semantics(spark):
    # a+b together days 1-3 (run 3); a+c together days 1,2,4,5 (max run
    # 2, total 4) -> only (a,b) qualifies at min_epochs=3.
    rows = []
    for d in (1, 2, 3, 4, 5):
        rows.append((1, _day(d), 10.0, 10.0))
        rows.append((2, _day(d), 12.0 if d <= 3 else 100.0, 10.0))
        rows.append((3, _day(d), 11.0 if d != 3 else 100.0, 11.0))
    df = rows_to_points(spark, rows)
    out = convoy.convoy_pairs(df, 5.0, DAY, 3, res=4, bounds=BOUNDS).collect()
    got = {(r["traj_a"], r["traj_b"]): (r["max_run"], r["n_epochs"]) for r in out}
    assert got == {("1", "2"): (3, 3)}
    # at min_epochs=2 the interrupted (a,c) pair appears with its split runs
    out2 = convoy.convoy_pairs(df, 5.0, DAY, 2, res=4, bounds=BOUNDS).collect()
    got2 = {(r["traj_a"], r["traj_b"]): (r["max_run"], r["n_epochs"]) for r in out2}
    assert got2[("1", "3")] == (2, 4)
    assert got2[("1", "2")] == (3, 3)


def test_convoy_pairs_cross_cell_contact(spark):
    # the pair straddles a grid-cell boundary (x=16 at res 4 over these
    # bounds) — the 9-way neighbor replication must still find it
    rows = []
    for d in (1, 2, 3):
        rows.append((1, _day(d), 15.5, 10.0))
        rows.append((2, _day(d), 16.5, 10.0))
    df = rows_to_points(spark, rows)
    out = convoy.convoy_pairs(df, 2.0, DAY, 3, res=4, bounds=BOUNDS).collect()
    assert [(r["traj_a"], r["traj_b"], r["max_run"]) for r in out] == [("1", "2", 3)]


def test_convoy_pairs_matches_bruteforce(spark):
    rng = np.random.RandomState(5)
    rows = []
    n_traj, n_days = 12, 8
    pos = rng.uniform(20, 100, (n_traj, 2))
    for d in range(1, n_days + 1):
        pos += rng.uniform(-6, 6, (n_traj, 2))
        for j in range(n_traj):
            rows.append((j, _day(d), float(pos[j, 0]), float(pos[j, 1])))
    df = rows_to_points(spark, rows)
    got = {
        (r["traj_a"], r["traj_b"]): (r["max_run"], r["n_epochs"])
        for r in convoy.convoy_pairs(df, 8.0, DAY, 2, res=4, bounds=BOUNDS).collect()
    }
    # brute force over the same daily positions
    by_day = {}
    for i, (tj, ts, x, y) in enumerate(rows):
        d = int(ts[8:10])
        by_day.setdefault(d, []).append((str(tj), x, y))
    together = {}
    for d, pts in by_day.items():
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                a, b = sorted((pts[i][0], pts[j][0]))
                if a == b:
                    continue
                dx, dy = pts[i][1] - pts[j][1], pts[i][2] - pts[j][2]
                if dx * dx + dy * dy <= 64.0:
                    together.setdefault((a, b), set()).add(d)
    expect = {}
    for pair, days in together.items():
        days = sorted(days)
        runs, cur = [], 1
        for k in range(1, len(days)):
            if days[k] == days[k - 1] + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        if max(runs) >= 2:
            expect[pair] = (max(runs), len(days))
    assert got == expect and expect  # non-degenerate scenario


def test_convoys_grouping(spark):
    # chain a-b and b-c (a never near c) -> one convoy of 3 labeled by
    # the min member; d alone -> no row (isolated nodes carry no pair)
    rows = []
    for d in (1, 2, 3):
        rows.append((1, _day(d), 10.0, 10.0))
        rows.append((2, _day(d), 13.0, 10.0))
        rows.append((3, _day(d), 16.0, 10.0))
        rows.append((4, _day(d), 100.0, 100.0))
    df = rows_to_points(spark, rows)
    out = convoy.convoys(df, 4.0, DAY, 3, res=4, bounds=BOUNDS).collect()
    got = {(r["traj_id"], r["convoy_id"], r["n_members"]) for r in out}
    assert got == {("1", "1", 3), ("2", "1", 3), ("3", "1", 3)}


def test_convoy_guards(spark):
    df = rows_to_points(spark, [(1, _day(1), 1.0, 1.0)])
    with pytest.raises(ValueError):
        convoy.convoy_pairs(df, 50.0, DAY, 2, res=4, bounds=BOUNDS)
    with pytest.raises(ValueError):
        convoy.convoy_pairs(df, 1.0, 0.0, 2, res=4, bounds=BOUNDS)


def test_convoy_plan_shape(spark):
    """Scale locks: shuffle-hash join (no broadcast of the replicated
    side), no Python in the plan."""
    rows = [(1, _day(d), 10.0, 10.0) for d in (1, 2)] + [
        (2, _day(d), 12.0, 10.0) for d in (1, 2)
    ]
    df = rows_to_points(spark, rows)
    plan = (
        convoy.convoy_pairs(df, 4.0, DAY, 2, res=4, bounds=BOUNDS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
