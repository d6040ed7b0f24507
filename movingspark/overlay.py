"""Overlay clip / intersection (SURVEY.md §2.9 X19-X20, §2.3 J4/J5).

Per-trajectory spatiotemporal clipping against a polygon, ported from
reference overlay.py:12-229 with its exact tolerances:

- entry/exit timestamps interpolated along each crossing segment by
  length ratio (linear in the segment parameter), reconstructed at
  microsecond precision (overlay.py:29-34)
- timestamps within 10 ms of an observed row snap to it (overlay.py:75-83)
- touching ranges dissolve into one (overlay.py:49-72)
- output pieces re-id'd "{traj_id}_{n}" in time order (overlay.py:136-152)

Execution: candidate pre-filter on the segment bbox (the reference's
R-tree query, overlay.py:171-188, done vectorized in numpy inside the
kernel), the whole clip running as one grouped-map pandas UDF per
trajectory — trajectories parallelize across executors, the polygon is
a plan constant shipped in the UDF closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from movingspark import kernels
from movingspark.schema import PointCols, TRAJ_COLS

SNAP_S = 0.010  # 10 ms tolerance (overlay.py:75-83)


def _clip_ranges_linebased(x, y, t, poly):
    """[(t0, tn, p0, pn)] spatiotemporal ranges of the track inside poly."""
    poly = np.asarray(poly, float)
    if np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    pminx, pminy = poly.min(axis=0)
    pmaxx, pmaxy = poly.max(axis=0)

    ranges = []
    n = len(x)
    for i in range(1, n):
        x0, y0, x1, y1 = x[i - 1], y[i - 1], x[i], y[i]
        # bbox candidate filter (reference sindex query)
        if max(x0, x1) < pminx or min(x0, x1) > pmaxx or max(y0, y1) < pminy or min(y0, y1) > pmaxy:
            continue
        if x0 == x1 and y0 == y1:
            # zero-length segment: inside iff the point is inside
            if kernels.point_in_polygon(np.array([x0]), np.array([y0]), poly)[0]:
                ranges.append((t[i - 1], t[i], (x0, y0), (x1, y1)))
            continue
        for s0, s1 in kernels.segment_polygon_clip((x0, y0), (x1, y1), poly):
            t0 = t[i - 1] + (t[i] - t[i - 1]) * s0
            tn = t[i - 1] + (t[i] - t[i - 1]) * s1
            # microsecond reconstruction (overlay.py:29-34)
            t0 = np.floor(t0 * 1e6) / 1e6
            tn = np.floor(tn * 1e6) / 1e6
            # snap to observed row times (overlay.py:40-43)
            if abs(tn - t[i]) < SNAP_S:
                tn = t[i]
            if abs(t0 - t[i - 1]) < SNAP_S:
                t0 = t[i - 1]
            p0 = (x0 + (x1 - x0) * s0, y0 + (y1 - y0) * s0)
            pn = (x0 + (x1 - x0) * s1, y0 + (y1 - y0) * s1)
            ranges.append((t0, tn, p0, pn))

    # dissolve touching ranges (overlay.py:49-72)
    dissolved = []
    cur = None
    for r in ranges:
        if cur is None:
            cur = list(r)
        elif r[0] == cur[1] or (r[0] > cur[1] and abs(r[0] - cur[1]) < SNAP_S):
            cur[1] = r[1]
            cur[3] = r[3]
        else:
            dissolved.append(tuple(cur))
            cur = list(r)
    if cur is not None:
        dissolved.append(tuple(cur))
    return dissolved


def _clip_ranges_pointbased(x, y, t, poly):
    """TRanges of maximal runs of inside points (overlay.py:155-168)."""
    poly = np.asarray(poly, float)
    inside = kernels.point_in_polygon(x, y, poly)
    ranges = []
    i = 0
    n = len(x)
    while i < n:
        if inside[i]:
            j = i
            while j + 1 < n and inside[j + 1]:
                j += 1
            ranges.append((t[i], t[j], None, None))
            i = j + 1
        else:
            i += 1
    return ranges


def clip(
    df: DataFrame,
    polygon,
    point_based: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X19 (overlay.py:219-229): clip each trajectory by the polygon.
    Output = input schema + `parent`; piece traj_id = "{parent}_{n}".
    Synthesized entry/exit rows inherit the padded previous row's
    attributes with interpolated position/time (overlay.py:94-133)."""
    poly = np.asarray(polygon, float)
    out_schema = T.StructType(df.schema.fields + [T.StructField("parent", T.StringType())])
    attr_cols = [c for c in df.columns if c not in (cols.traj_id, cols.t, cols.x, cols.y)]

    def per_traj(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(cols.t).reset_index(drop=True)
        x = pdf[cols.x].to_numpy(float)
        y = pdf[cols.y].to_numpy(float)
        tsec = pdf[cols.t].astype("int64").to_numpy() / 1e9
        tid = pdf[cols.traj_id].iloc[0]

        if point_based:
            ranges = _clip_ranges_pointbased(x, y, tsec, poly)
        else:
            ranges = _clip_ranges_linebased(x, y, tsec, poly)

        pieces = []
        counter = 0
        for (t0, tn, p0, pn) in ranges:
            rows = pdf[(tsec >= t0) & (tsec <= tn)]
            extra = []
            if p0 is not None and not np.isclose(tsec, t0, rtol=0, atol=5e-7).any():
                pad = pdf[tsec <= t0].iloc[-1] if (tsec <= t0).any() else pdf.iloc[0]
                r0 = pad.copy()
                r0[cols.t] = pd.Timestamp(round(t0 * 1e6) * 1000)
                r0[cols.x], r0[cols.y] = p0
                extra.append(r0)
            if pn is not None and not np.isclose(tsec, tn, rtol=0, atol=5e-7).any():
                pad = pdf[tsec <= tn].iloc[-1] if (tsec <= tn).any() else pdf.iloc[0]
                rn = pad.copy()
                rn[cols.t] = pd.Timestamp(round(tn * 1e6) * 1000)
                rn[cols.x], rn[cols.y] = pn
                extra.append(rn)
            piece = pd.concat([rows] + [e.to_frame().T for e in extra]) if extra else rows
            piece = piece.sort_values(cols.t)
            if len(piece) < 2 or piece[cols.t].iloc[0] == piece[cols.t].iloc[-1]:
                continue
            piece = piece.copy()
            piece["parent"] = tid
            piece[cols.traj_id] = f"{tid}_{counter}"
            counter += 1
            pieces.append(piece)

        if not pieces:
            empty = pdf.iloc[0:0].copy()
            empty["parent"] = pd.Series(dtype=object)
            return empty
        out = pd.concat(pieces, ignore_index=True)
        out[cols.t] = pd.to_datetime(out[cols.t])
        for c in (cols.x, cols.y):
            out[c] = out[c].astype(float)
        return out[[*pdf.columns, "parent"]]

    return df.groupBy(cols.traj_id).applyInPandas(per_traj, schema=out_schema)


def intersection_with_feature(
    df: DataFrame,
    polygon,
    feature_props: dict,
    point_based: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X20 (overlay.py:246-258): clip + append the intersecting feature's
    properties as `intersecting_<key>` columns."""
    from pyspark.sql import functions as F

    out = clip(df, polygon, point_based, cols)
    for k, v in feature_props.items():
        out = out.withColumn(f"intersecting_{k}", F.lit(v))
    return out
