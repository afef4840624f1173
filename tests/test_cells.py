"""Cell-grid index tests (engine-owned component; SURVEY.md §2.4)."""

import duckdb
import numpy as np
import pytest

from shapely_spark.geo import box, point, polygon
from shapely_spark.geo import kernels as K
from shapely_spark.index import cells


def test_cell_roundtrip_bounds():
    lat, lon = 48.85, 2.35  # Paris
    c = int(cells.cell_of(lat, lon, 9))
    xmin, ymin, xmax, ymax = cells.cell_bounds(c, 9)
    assert xmin <= lon < xmax
    assert ymin <= lat < ymax


def test_cell_nan_is_minus_one():
    out = cells.cell_of([np.nan, 10.0], [5.0, np.nan], 9)
    assert out.tolist() == [-1, -1]


def test_cell_edges_clamped():
    assert cells.cell_of(90.0, 180.0, 4) == cells.cell_of(89.99, 179.99, 4)
    assert cells.cell_of(-90.0, -180.0, 4) == 0


def test_sql_cell_expr_matches_numpy():
    """The SQL expression (used by both Spark and the DuckDB oracle) must be
    bit-identical to the NumPy kernel on random coordinates."""
    rng = np.random.RandomState(42)
    lat = rng.uniform(-85, 85, 5000)
    lon = rng.uniform(-180, 180, 5000)
    want = cells.cell_of(lat, lon, 9)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"lat": lat, "lon": lon}))
    expr = cells.sql_cell_expr("lat", "lon", 9)
    got = con.execute(f"SELECT {expr} AS c FROM t").fetchnumpy()["c"]
    np.testing.assert_array_equal(want, got)


def test_disk_and_ring():
    c = int(cells.cell_of(0.0, 0.0, 6))
    d0 = cells.disk(c, 0, 6)
    assert d0.tolist() == [c]
    d1 = cells.disk(c, 1, 6)
    assert len(d1) == 9
    r1 = cells.ring(c, 1, 6)
    assert len(r1) == 8
    assert c not in r1.tolist()


def test_disk_clamps_at_pole_and_wraps_lon():
    n = cells.grid_n(6)
    top = int(cells.cell_of(89.9, 0.0, 6))
    d = cells.disk(top, 1, 6)
    assert len(d) == 6  # 3 wide × 2 tall (clamped at top)
    left = int(cells.cell_of(0.0, -179.999, 6))
    d = cells.disk(left, 1, 6)
    assert len(d) == 9  # lon wraps


def test_cover_bbox():
    res = 6
    cs = cells.cover_bbox(-1.0, -1.0, 1.0, 1.0, res)
    # must include the cells of all four corners
    for lat, lon in [(-1, -1), (-1, 1), (1, -1), (1, 1)]:
        assert int(cells.cell_of(lat, lon, res)) in cs.tolist()


def test_polygon_cover_full_vs_partial():
    res = 6  # cell 5.625° × 2.8125°
    poly = box(-20, -20, 20, 20)
    cover, full = cells.polygon_cover(poly, res)
    assert len(cover) > 0
    # every fully-covered cell's corners must be interior
    for c, f in zip(cover.tolist(), full.tolist()):
        xmin, ymin, xmax, ymax = cells.cell_bounds(c, res)
        corners = np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]])
        cls = K.points_in_rings_class(corners[:, 0], corners[:, 1], [poly.rings[0]])
        if f:
            assert (cls == K.INTERIOR).all()
    # point-in-cover completeness: any point inside the polygon falls in a
    # covered cell
    rng = np.random.RandomState(1)
    lat = rng.uniform(-19.9, 19.9, 200)
    lon = rng.uniform(-19.9, 19.9, 200)
    pc = cells.cell_of(lat, lon, res)
    assert np.isin(pc, cover).all()


def test_polygon_cover_small_polygon_within_one_cell():
    res = 4
    tiny = box(1.0, 1.0, 1.1, 1.1)
    cover, full = cells.polygon_cover(tiny, res)
    assert int(cells.cell_of(1.05, 1.05, res)) in cover.tolist()
    assert not full.any()


def test_hilbert_key_locality():
    # nearby points get nearby keys more often than far points (weak check)
    k1 = cells.hilbert_key(10.0, 10.0)
    k2 = cells.hilbert_key(10.001, 10.001)
    k3 = cells.hilbert_key(-60.0, 150.0)
    assert abs(int(k1) - int(k2)) < abs(int(k1) - int(k3))


def test_cell_parent_matches_direct_assignment():
    # floor-at-res then bit-shift must equal floor-at-parent-res exactly
    # (power-of-two scaling is exact in IEEE-754), including the clamped
    # poles/antimeridian and the NaN -> -1 convention
    rng = np.random.RandomState(7)
    lat = np.concatenate([rng.uniform(-90, 90, 5000),
                          [90.0, -90.0, 89.9999999, np.nan]])
    lon = np.concatenate([rng.uniform(-180, 180, 5000),
                          [180.0, -180.0, 179.9999999, 3.0]])
    for res, pres in [(9, 7), (9, 9), (12, 0), (7, 4)]:
        got = cells.cell_parent(cells.cell_of(lat, lon, res), res, pres)
        want = cells.cell_of(lat, lon, pres)
        np.testing.assert_array_equal(got, want)


def test_cell_children_roundtrip():
    kids = cells.cell_children(37, 4, 6)
    assert len(kids) == 16
    assert len(set(kids.tolist())) == 16
    np.testing.assert_array_equal(cells.cell_parent(kids, 6, 4), np.full(16, 37))
    # default: one level down, quad split
    assert len(cells.cell_children(0, 4)) == 4
    # children tile the parent's bounds
    pxmin, pymin, pxmax, pymax = cells.cell_bounds(37, 4)
    for c in kids.tolist():
        xmin, ymin, xmax, ymax = cells.cell_bounds(c, 6)
        assert pxmin - 1e-9 <= xmin and xmax <= pxmax + 1e-9
        assert pymin - 1e-9 <= ymin and ymax <= pymax + 1e-9


def test_cell_children_null_island_sentinel():
    # -1 (null coords) must propagate as -1, mirroring cell_parent
    np.testing.assert_array_equal(
        cells.cell_children(-1, 4, 6), np.array([-1], dtype=np.int64))
    np.testing.assert_array_equal(
        cells.cell_parent(np.array([-1]), 6, 4), np.array([-1]))


def test_cell_parent_validation():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cells.cell_parent(np.array([5]), 4, 5)
    with _pytest.raises(ValueError):
        cells.cell_children(5, 4, 3)
