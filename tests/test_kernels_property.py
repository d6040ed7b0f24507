"""Property-based kernel tests (hypothesis) — Spark-free, fast."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from movingspark import kernels as K
from movingspark.cells import cell_bounds_np, cell_id_np, polygon_cover

lon = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
lat = st.floats(min_value=-89.0, max_value=89.0, allow_nan=False)
coord = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lon, lat, lon, lat)
def test_geodesic_symmetric_nonnegative(lo1, la1, lo2, la2):
    d1 = float(K.geodesic(lo1, la1, lo2, la2))
    d2 = float(K.geodesic(lo2, la2, lo1, la1))
    assert d1 >= 0.0
    assert abs(d1 - d2) <= 1e-6 * max(d1, 1.0)
    # never exceeds half the earth's circumference (+tolerance)
    assert d1 <= 2.004e7 + 1000


@settings(max_examples=200, deadline=None)
@given(lon, lat, lon, lat)
def test_geodesic_close_to_haversine(lo1, la1, lo2, la2):
    g = float(K.geodesic(lo1, la1, lo2, la2))
    h = float(K.haversine(lo1, la1, lo2, la2))
    # WGS84 flattening bounds the disagreement to ~0.6%
    assert abs(g - h) <= 0.01 * max(h, 1.0) + 1.0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=40))
def test_hull_contains_all_points(pts):
    xy = np.array(pts, dtype=float)
    hull = K.convex_hull(xy)
    if len(hull) < 3:
        return  # collinear/degenerate
    inside = K.point_in_polygon(xy[:, 0], xy[:, 1], hull)
    assert inside.all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=30), st.floats(0.01, 100))
def test_dp_mask_keeps_endpoints(pts, tol):
    xy = np.array(pts, dtype=float)
    mask = K.dp_mask(xy, tol)
    assert mask[0] and mask[-1]
    # increasing tolerance never keeps more points
    mask2 = K.dp_mask(xy, tol * 10)
    assert mask2.sum() <= mask.sum()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lon, lat), min_size=1, max_size=50), st.integers(1, 10))
def test_cell_id_roundtrip_bounds(pts, res):
    xy = np.array(pts, dtype=float)
    ids = cell_id_np(xy[:, 0], xy[:, 1], res)
    assert (ids >= 0).all() and (ids < 4**res).all()
    b = cell_bounds_np(ids, res)
    eps = 1e-9
    assert (xy[:, 0] >= b[:, 0] - eps).all() and (xy[:, 0] <= b[:, 2] + eps).all()
    assert (xy[:, 1] >= b[:, 1] - eps).all() and (xy[:, 1] <= b[:, 3] + eps).all()


@settings(max_examples=30, deadline=None)
@given(
    st.floats(-170, 160), st.floats(-80, 70),
    st.floats(1, 20), st.floats(1, 15), st.integers(3, 7),
)
def test_polygon_cover_covers_inside_points(x0, y0, w, h, res):
    poly = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])
    cover, full = polygon_cover(poly, res)
    # any point inside the polygon must land in a covered cell
    rng = np.random.RandomState(0)
    px = x0 + rng.rand(20) * w
    py = y0 + rng.rand(20) * h
    ids = cell_id_np(px, py, res)
    assert set(ids.tolist()) <= set(cover.tolist())


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=20),
       st.lists(st.tuples(coord, coord), min_size=2, max_size=20))
def test_hausdorff_symmetry_identity(a, b):
    A = np.array(a, dtype=float)
    B = np.array(b, dtype=float)
    assert K.hausdorff(A, A) == 0.0
    assert abs(K.hausdorff(A, B) - K.hausdorff(B, A)) < 1e-12


@settings(max_examples=60, deadline=None)
@given(st.floats(0, 359.99), st.floats(0, 359.99))
def test_angular_difference_range(d1, d2):
    d = float(K.angular_difference(d1, d2))
    assert 0.0 <= d <= 180.0
