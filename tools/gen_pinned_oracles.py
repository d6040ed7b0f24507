"""Generate expected-output oracles for the sequential operators
(Douglas-Peucker, stop detector, convex hull) at sf0.01.

These kernels are irreducibly sequential per trajectory, so no
closed-form DuckDB SQL can recompute them. Instead this tool runs the
SAME numpy kernels over the parquet data in a plain pandas process (no
Spark) and bakes the per-trajectory results into SQL:

- generalize_dp: the DROPPED row ordinals per trajectory (DP keeps most
  rows, so the drop-list is the compact encoding); the oracle re-derives
  the kept rows by anti-list-membership over ROW_NUMBER().
- mcp: the hull-vertex row ordinals in CCW hull order; the oracle
  unnests them with subscripts to rebuild (traj_id, vertex, x, y).
- stop_points: only the detector's (start_us, end_us) ranges are pinned
  — the median/min/max/stop_id aggregation is INDEPENDENTLY recomputed
  by DuckDB over the raw points, so the oracle still exercises real SQL
  semantics on top of the pinned sequential boundary decisions.

The comparison therefore checks that Spark's distributed execution
(grouping, per-group ordering, Arrow batching, range join) reproduces
the single-process kernel output. Valid ONLY for the sf0.01 dataset the
driver uses for its correctness gate.

Usage: python tools/gen_pinned_oracles.py [sf_dir] [out_py]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

sys.path.insert(0, "/root/repo")

from movingspark import kernels
from movingspark.ingest import EVENTS_POINTS_ORACLE_FULL
from movingspark.stops import _detect_stops_np

DP_TOLERANCE = 10.0
STOP_MAX_DIAMETER = 50.0
STOP_MIN_DURATION_S = 7200.0


def load_points(sf_dir: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    q = f"""
        SELECT traj_id, epoch_us(t) AS tus, x, y,
               ROW_NUMBER() OVER (PARTITION BY traj_id ORDER BY t) AS rn
        FROM ({EVENTS_POINTS_ORACLE_FULL})
        ORDER BY traj_id, tus
    """
    return con.execute(q).df()


def dp_drop_lists(pts) -> dict[str, list[int]]:
    out = {}
    for tid, g in pts.groupby("traj_id", sort=True):
        g = g.sort_values("tus")
        xy = np.column_stack([g["x"].to_numpy(float), g["y"].to_numpy(float)])
        dp = kernels.dp_mask(xy, DP_TOLERANCE)
        kept_coords = {(a, b) for a, b in xy[dp]}
        mask = np.array([(a, b) in kept_coords for a, b in xy])
        dropped = g["rn"].to_numpy()[~mask].tolist()
        if dropped:
            out[str(tid)] = [int(r) for r in dropped]
    return out


def hull_rn_lists(pts) -> dict[str, list[int]]:
    out = {}
    for tid, g in pts.groupby("traj_id", sort=True):
        g = g.sort_values("tus")
        xy = np.column_stack([g["x"].to_numpy(float), g["y"].to_numpy(float)])
        h = kernels.convex_hull(xy)
        rns = []
        for hx, hy in h:
            m = np.flatnonzero((xy[:, 0] == hx) & (xy[:, 1] == hy))
            rns.append(int(g["rn"].to_numpy()[m[0]]))
        out[str(tid)] = rns
    return out


def stop_ranges(pts) -> list[tuple[str, int, int]]:
    out = []
    for tid, g in pts.groupby("traj_id", sort=True):
        g = g.sort_values("tus")
        # float seconds EXACTLY as the engine computes them (ns int / 1e9;
        # dividing µs by 1e6 can differ in the last ulp and flip a
        # borderline >= min_duration comparison)
        ts = (g["tus"].to_numpy(np.int64) * 1000).astype(np.float64) / 1e9
        ranges = _detect_stops_np(
            g["x"].to_numpy(float), g["y"].to_numpy(float), ts,
            STOP_MAX_DIAMETER, STOP_MIN_DURATION_S, latlon=False,
        )
        for s, e in ranges:
            out.append((str(tid), int(round(s * 1e6)), int(round(e * 1e6))))
    return out


def build_sql(drop, hull, ranges) -> dict[str, str]:
    pts_cte = f"""
  SELECT traj_id, t, x, y,
         ROW_NUMBER() OVER (PARTITION BY traj_id ORDER BY t) AS rn
  FROM ({EVENTS_POINTS_ORACLE_FULL})
"""
    drop_vals = ", ".join(
        f"('{tid}', {lst})" for tid, lst in sorted(drop.items())
    ) or "('__none__', [0])"
    sql_dp = f"""
WITH pts AS ({pts_cte}),
dropped(traj_id, rns) AS (VALUES {drop_vals})
SELECT p.traj_id, p.t, p.x, p.y
FROM pts p LEFT JOIN dropped d ON p.traj_id = d.traj_id
WHERE d.traj_id IS NULL OR NOT list_contains(d.rns, p.rn)
"""

    hull_vals = ", ".join(f"('{tid}', {lst})" for tid, lst in sorted(hull.items()))
    sql_mcp = f"""
WITH pts AS ({pts_cte}),
hull(traj_id, rns) AS (VALUES {hull_vals}),
hx AS (
  SELECT traj_id, UNNEST(rns) AS rn,
         CAST(generate_subscripts(rns, 1) - 1 AS INT) AS vertex
  FROM hull
)
SELECT h.traj_id, h.vertex, p.x, p.y
FROM hx h JOIN pts p ON h.traj_id = p.traj_id AND h.rn = p.rn
"""

    rng_vals = ", ".join(f"('{tid}', {s}, {e})" for tid, s, e in sorted(ranges)) or "('__none__', 0, 0)"
    sql_stops = f"""
WITH pts AS ({pts_cte}),
rng(traj_id, start_us, end_us) AS (VALUES {rng_vals}),
joined AS (
  SELECT p.traj_id, p.t, p.x, p.y, r.start_us, r.end_us
  FROM pts p JOIN rng r ON p.traj_id = r.traj_id
   AND epoch_us(p.t) >= r.start_us AND epoch_us(p.t) <= r.end_us
),
agg AS (
  SELECT traj_id, start_us, end_us,
         quantile_cont(x, 0.5) AS x, quantile_cont(y, 0.5) AS y,
         MIN(t) AS start_time, MAX(t) AS end_time
  FROM joined GROUP BY 1, 2, 3
)
SELECT traj_id || '_' || strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S') AS stop_id,
       traj_id, start_time, end_time,
       (epoch_us(end_time) - epoch_us(start_time)) / 1000000.0 AS duration_s,
       ROUND(ROUND(x, 9), 5) AS x, ROUND(ROUND(y, 9), 5) AS y
FROM agg
"""
    return {"generalize_dp": sql_dp, "mcp": sql_mcp, "stop_points": sql_stops}


def main():
    sf_dirs = sys.argv[1:-1] if len(sys.argv) > 2 else (
        sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    )
    out_py = (
        sys.argv[-1]
        if len(sys.argv) > 2 and sys.argv[-1].endswith(".py")
        else "/root/repo/movingspark/pinned_oracles_sf001.py"
    )
    if not sf_dirs or sf_dirs[-1] == out_py:
        sf_dirs = sf_dirs[:-1] or ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    by_sf = {}
    stats = {}
    for sf_dir in sf_dirs:
        pts = load_points(sf_dir)
        drop = dp_drop_lists(pts)
        hull = hull_rn_lists(pts)
        ranges = stop_ranges(pts)
        by_sf[sf_dir] = build_sql(drop, hull, ranges)
        stats[sf_dir] = (
            sum(len(v) for v in drop.values()),
            sum(len(v) for v in hull.values()),
            len(ranges),
        )
    primary = sf_dirs[0]
    with open(out_py, "w") as f:
        f.write(
            '"""GENERATED by tools/gen_pinned_oracles.py — do not edit.\n\n'
            "Expected-output oracles for the sequential ops, one set per sf\n"
            f"dir {list(by_sf)} (stats per dir: {stats}).\n"
            f"PINNED_SQL is the {primary} set (the driver's correctness sf);\n"
            "tools/check_correctness.py selects by sf_dir from\n"
            'PINNED_SQL_BY_SF. Regenerate after changing the DP/stop/hull\n'
            'kernels or their query parameters."""\n\n'
        )
        f.write("PINNED_SQL_BY_SF = {\n")
        for sf_dir, sqls in by_sf.items():
            f.write(f"    {sf_dir!r}: {{\n")
            for k, v in sqls.items():
                f.write(f"        {k!r}: {v!r},\n")
            f.write("    },\n")
        f.write("}\n\n")
        f.write(f"PINNED_SQL = PINNED_SQL_BY_SF[{primary!r}]\n")
    print(f"wrote {out_py}: {stats}")


if __name__ == "__main__":
    main()
