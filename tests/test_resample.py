import datetime as dt

import pytest

from movingspark.resample import resample_trajectories

E = dt.datetime(2024, 1, 1)


def _ts(s):
    return E + dt.timedelta(seconds=s)


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "traj_id string, t timestamp, x double, y double"
    )


def test_resample_grid_lerp_and_endpoints(spark):
    # a: obs at 0/10/25 s — ticks 0,10,20 (25 off-grid, dropped);
    #    tick 20 lerps segment (10s..25s) at frac 2/3.
    # b: single point — emitted once at tick 0.
    # c: final obs exactly on-grid — emitted exactly once.
    df = _pts(
        spark,
        [
            ("a", _ts(0), 0.0, 0.0),
            ("a", _ts(10), 10.0, 0.0),
            ("a", _ts(25), 25.0, 5.0),
            ("b", _ts(0), 1.0, 1.0),
            ("c", _ts(0), 0.0, 0.0),
            ("c", _ts(30), 30.0, 30.0),
        ],
    )
    out = {
        (r["traj_id"], (r["t"] - E).total_seconds()): (r["x"], r["y"])
        for r in resample_trajectories(df, 10.0).collect()
    }
    assert set(out) == {
        ("a", 0.0), ("a", 10.0), ("a", 20.0),
        ("b", 0.0),
        ("c", 0.0), ("c", 10.0), ("c", 20.0), ("c", 30.0),
    }
    assert out[("a", 20.0)] == (20.0, pytest.approx(10.0 / 3.0))
    assert out[("c", 20.0)] == (20.0, 20.0)
    assert out[("c", 30.0)] == (30.0, 30.0)  # exact endpoint, no lerp drift


def test_resample_tick_on_observation_uses_exact_coords(spark):
    # tick falls exactly on the middle observation: frac 0 on the segment
    # that starts there -> exact observed coordinate, exactly one row.
    df = _pts(
        spark,
        [("a", _ts(0), 0.0, 0.0), ("a", _ts(5), 7.0, -3.0), ("a", _ts(12), 9.0, 9.0)],
    )
    rows = resample_trajectories(df, 5.0).collect()
    by_t = {(r["t"] - E).total_seconds(): (r["x"], r["y"]) for r in rows}
    assert len(rows) == len(by_t) == 3  # ticks 0,5,10 (12 off-grid)
    assert by_t[5.0] == (7.0, -3.0)
    assert by_t[10.0] == (pytest.approx(7.0 + 2 * 5 / 7), pytest.approx(-3.0 + 12 * 5 / 7))


def test_resample_denser_than_input_densifies(spark):
    # 1 Hz grid over a 10 s two-point trajectory -> 11 evenly spaced points.
    df = _pts(spark, [("a", _ts(0), 0.0, 0.0), ("a", _ts(10), 10.0, 20.0)])
    rows = sorted(resample_trajectories(df, 1.0).collect(), key=lambda r: r["t"])
    assert len(rows) == 11
    for k, r in enumerate(rows):
        assert r["x"] == pytest.approx(float(k))
        assert r["y"] == pytest.approx(2.0 * k)


def test_resample_invalid_interval(spark):
    df = _pts(spark, [("a", _ts(0), 0.0, 0.0)])
    with pytest.raises(ValueError):
        resample_trajectories(df, 0.0)


def test_resample_matches_numpy_reference_randomized(spark):
    """Randomized parity vs a numpy grid-interpolation reference:
    off-grid endpoints, single-point trajectories, dense and sparse
    sampling."""
    import numpy as np

    rng = np.random.default_rng(5)
    interval = 7.0
    i_us = int(interval * 1e6)
    rows, ref = [], {}
    for tid in range(8):
        n = int(rng.integers(1, 25))
        t_us = np.sort(rng.choice(np.arange(0, 500_000_000, 1000), n, replace=False))
        xs = rng.uniform(-5, 5, n).round(4)
        ys = rng.uniform(-5, 5, n).round(4)
        rows += [
            (f"r{tid}", _ts(int(t) / 1e6), float(x), float(y))
            for t, x, y in zip(t_us, xs, ys)
        ]
        # reference: ticks t0 + k*I while <= tmax; lerp between brackets
        t0, tmax = int(t_us[0]), int(t_us[-1])
        k = 0
        while t0 + k * i_us <= tmax:
            tick = t0 + k * i_us
            j = int(np.searchsorted(t_us, tick, "right")) - 1
            if t_us[j] == tick or j == n - 1:
                ref[(f"r{tid}", tick)] = (float(xs[j]), float(ys[j]))
            else:
                fr = (tick - t_us[j]) / (t_us[j + 1] - t_us[j])
                ref[(f"r{tid}", tick)] = (
                    float(xs[j] + (xs[j + 1] - xs[j]) * fr),
                    float(ys[j] + (ys[j + 1] - ys[j]) * fr),
                )
            k += 1
    df = _pts(spark, rows)
    one_us = dt.timedelta(microseconds=1)
    got = {
        (r["traj_id"], (r["t"] - E) // one_us): (r["x"], r["y"])
        for r in resample_trajectories(df, interval).collect()
    }
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][0] == pytest.approx(ref[k][0], rel=1e-12), k
        assert got[k][1] == pytest.approx(ref[k][1], rel=1e-12), k
