"""KalmanSmootherCV (X15, reference trajectory_smoother.py:87-233).

Constant-velocity Kalman filter + Rauch-Tung-Striebel smoother over
each trajectory, re-implemented in numpy (the reference delegates to
Stone Soup, an optional dependency): state [x, vx, y, vy], transition
F_dt = [[1, dt], [0, 1]] per axis, process noise = white-acceleration
model q * [[dt^3/3, dt^2/2], [dt^2/2, dt]], measurement = position
with variance r. Runs per trajectory as a grouped-map pandas UDF.

Lat/lon trajectories are smoothed in the EPSG:3395 World Mercator
metric frame — the same projection the reference passes latlon
trajectories through before filtering and back after
(trajectory_smoother.py:197-233, df.to_crs("EPSG:3395") ... to_crs
back) — via kernels.mercator_forward/mercator_inverse, so the latlon
path carries the reference's semantics rather than a local
equirectangular approximation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from movingspark import kernels
from movingspark.schema import PointCols, TRAJ_COLS


def _kf_rts_1d(z: np.ndarray, dts: np.ndarray, q: float, r: float):
    """Kalman filter + RTS smoother for one axis. z: measurements,
    dts[i]: time delta from i-1 to i (dts[0] unused)."""
    n = len(z)
    xs = np.zeros((n, 2))
    Ps = np.zeros((n, 2, 2))
    x_preds = np.zeros((n, 2))
    P_preds = np.zeros((n, 2, 2))
    H = np.array([[1.0, 0.0]])

    x = np.array([z[0], 0.0])
    P = np.diag([r, r])
    xs[0], Ps[0] = x, P
    x_preds[0], P_preds[0] = x, P

    Fs = np.zeros((n, 2, 2))
    Fs[0] = np.eye(2)
    for i in range(1, n):
        dt = max(dts[i], 1e-9)
        Fm = np.array([[1.0, dt], [0.0, 1.0]])
        Q = q * np.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]])
        Fs[i] = Fm
        x_pred = Fm @ x
        P_pred = Fm @ P @ Fm.T + Q
        x_preds[i], P_preds[i] = x_pred, P_pred
        y = z[i] - (H @ x_pred)[0]
        S = (H @ P_pred @ H.T)[0, 0] + r
        K = (P_pred @ H.T)[:, 0] / S
        x = x_pred + K * y
        P = P_pred - np.outer(K, H @ P_pred)
        xs[i], Ps[i] = x, P

    # RTS backward pass
    xs_s = xs.copy()
    Ps_s = Ps.copy()
    for i in range(n - 2, -1, -1):
        C = Ps[i] @ Fs[i + 1].T @ np.linalg.inv(P_preds[i + 1])
        xs_s[i] = xs[i] + C @ (xs_s[i + 1] - x_preds[i + 1])
        Ps_s[i] = Ps[i] + C @ (Ps_s[i + 1] - P_preds[i + 1]) @ C.T
    return xs_s[:, 0]


def kalman_smooth(
    df: DataFrame,
    process_noise_std: float = 0.5,
    measurement_noise_std: float = 1.0,
    latlon: bool = False,
    cols: PointCols = TRAJ_COLS,
) -> DataFrame:
    """X15: replace x/y with CV-Kalman+RTS smoothed positions."""
    q = float(process_noise_std) ** 2
    r = float(measurement_noise_std) ** 2
    out_schema = df.schema

    def per_traj(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(cols.t).reset_index(drop=True)
        if len(pdf) < 2:
            return pdf
        t = pdf[cols.t].astype("int64").to_numpy() / 1e9
        dts = np.diff(t, prepend=t[0])
        x = pdf[cols.x].to_numpy(float)
        y = pdf[cols.y].to_numpy(float)
        if latlon:
            mx, my = kernels.mercator_forward(x, y)
            sx = _kf_rts_1d(mx, dts, q, r)
            sy = _kf_rts_1d(my, dts, q, r)
            pdf[cols.x], pdf[cols.y] = kernels.mercator_inverse(sx, sy)
        else:
            pdf[cols.x] = _kf_rts_1d(x, dts, q, r)
            pdf[cols.y] = _kf_rts_1d(y, dts, q, r)
        return pdf

    from movingspark.gmap import grouped_apply_sorted

    return grouped_apply_sorted(df, per_traj, out_schema, cols)
