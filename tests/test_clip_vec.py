"""Vectorized clip must be bit-identical to the scalar kernel."""

import numpy as np
import pytest

from geojson_vt_ray.kernels.clip import AXIS_X, AXIS_Y
from geojson_vt_ray.kernels.clip_vec import clip_ring_vec
from geojson_vt_ray.kernels.feature import Slice


def _scalar_clip(points, start, end, axis, is_polygon):
    """Reference scalar path, invoked directly (bypasses the size switch)."""
    from geojson_vt_ray.kernels import clip as clip_mod

    out = []
    sl = Slice(list(points), 1.0, 0.0, 1.0)
    # temporarily force the scalar branch by calling with a low-level copy
    orig = clip_mod.VEC_MIN_FLOATS
    try:
        clip_mod.VEC_MIN_FLOATS = 10**9
        clip_mod._clip_line(sl, out, start, end, axis, is_polygon, False)
    finally:
        clip_mod.VEC_MIN_FLOATS = orig
    return [np.asarray(s.points, dtype=np.float64) for s in out]


def _rings(seed):
    rs = np.random.RandomState(seed)
    n = rs.randint(2, 200)
    xy = rs.uniform(-0.5, 1.5, size=(n, 2))
    # inject exact boundary hits and duplicates (adversarial for edge rules)
    for _ in range(rs.randint(0, 5)):
        i = rs.randint(n)
        xy[i, rs.randint(2)] = rs.choice([0.25, 0.75])
    if rs.rand() < 0.3 and n > 2:
        i = rs.randint(n - 1)
        xy[i + 1] = xy[i]
    z = rs.choice([0.0, 1.0, 0.5], size=n)
    pts = np.column_stack([xy, z]).reshape(-1)
    return pts


@pytest.mark.parametrize("seed", range(60))
@pytest.mark.parametrize("axis", [AXIS_X, AXIS_Y])
@pytest.mark.parametrize("is_polygon", [False, True])
def test_vec_matches_scalar(seed, axis, is_polygon):
    pts = _rings(seed)
    if is_polygon:
        pts = np.concatenate([pts, pts[:3]])  # closed ring
    start, end = 0.25, 0.75
    got = clip_ring_vec(pts.copy(), start, end, axis, is_polygon)
    want = _scalar_clip(pts.tolist(), start, end, axis, is_polygon)
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert np.array_equal(g, w), (g[:12], w[:12])


def test_vec_slab_spanning_segment():
    # one segment crossing the whole slab both directions
    pts = np.array([0.0, 0.5, 1.0, 1.0, 0.5, 1.0, 0.0, 0.5, 1.0], dtype=np.float64)
    got = clip_ring_vec(pts, 0.25, 0.75, AXIS_X, False)
    want = _scalar_clip(pts.tolist(), 0.25, 0.75, AXIS_X, False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
