"""Property-based (hypothesis) invariants for the cell-index kernels.

The deterministic unit tests pin known cases; these fuzz the algebraic
contracts over the whole input domain — the properties a shuffle key
must never violate regardless of where data lands.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geojson_vt_ray.kernels import hex as hx
from geojson_vt_ray.kernels import s2
from geojson_vt_ray.kernels.cells import hilbert_decode, hilbert_encode, morton_decode, morton_encode

unit = st.floats(min_value=0.0, max_value=1.0, exclude_max=True, allow_nan=False)
coords = st.lists(st.tuples(unit, unit), min_size=1, max_size=64)


@settings(max_examples=150, deadline=None)
@given(coords, st.integers(min_value=0, max_value=14))
def test_s2_parent_is_prefix(pts, level):
    mx = np.array([p[0] for p in pts])
    my = np.array([p[1] for p in pts])
    fine = s2.s2_cell_id(mx, my, level + 1)
    coarse = s2.s2_cell_id(mx, my, level)
    np.testing.assert_array_equal(s2.cell_id_parent(fine, level), coarse)
    np.testing.assert_array_equal(s2.cell_id_level(fine), level + 1)
    # same-point determinism: re-encoding is identical
    np.testing.assert_array_equal(s2.s2_cell_id(mx, my, level + 1), fine)


@settings(max_examples=150, deadline=None)
@given(coords, st.integers(min_value=0, max_value=hx.MAX_RES))
def test_hex_center_fixpoint(pts, res):
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    cell = hx.hex_cell(x, y, res)
    q, r = hx.hex_unpack(cell)
    cx, cy = hx.hex_center(q, r, hx.hex_size(res))
    np.testing.assert_array_equal(hx.hex_cell(cx, cy, res), cell)
    # the point is never far from its cell center (containment radius)
    d = np.sqrt((cx - x) ** 2 + (cy - y) ** 2)
    assert np.all(d <= hx.hex_size(res) * (1 + 1e-9))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 20) - 1), min_size=1, max_size=64),
    st.lists(st.integers(min_value=0, max_value=(1 << 20) - 1), min_size=1, max_size=64),
)
def test_curve_roundtrips(xs, ys):
    n = min(len(xs), len(ys))
    x = np.asarray(xs[:n], dtype=np.uint64)
    y = np.asarray(ys[:n], dtype=np.uint64)
    mx, my = morton_decode(morton_encode(x, y))
    np.testing.assert_array_equal(mx, x)
    np.testing.assert_array_equal(my, y)
    hxc, hyc = hilbert_decode(hilbert_encode(x, y, 20), 20)
    np.testing.assert_array_equal(hxc, x)
    np.testing.assert_array_equal(hyc, y)


@settings(max_examples=100, deadline=None)
@given(coords)
def test_s2_xyz_on_unit_sphere(pts):
    mx = np.array([p[0] for p in pts])
    my = np.array([p[1] for p in pts])
    x, y, z = s2.mercator_to_xyz(mx, my)
    np.testing.assert_allclose(x * x + y * y + z * z, 1.0, atol=1e-12)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(1 << 22), max_value=1 << 22), min_size=2, max_size=32))
def test_hex_distance_triangle(qs):
    n = len(qs) // 2 * 2
    q = np.asarray(qs[:n], dtype=np.int64)
    cells = q[: n // 2] * hx._PACK + q[n // 2 :]
    a, b = cells, np.roll(cells, 1)
    c = np.roll(cells, 2)
    np.testing.assert_array_equal(hx.hex_distance(a, b), hx.hex_distance(b, a))
    assert np.all(
        hx.hex_distance(a, c) <= hx.hex_distance(a, b) + hx.hex_distance(b, c)
    )
    assert np.all(hx.hex_distance(a, a) == 0)
