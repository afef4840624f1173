"""Group-vectorized predicates must agree with the scalar kernels
(which pin the reference: shapely/predicates.py) on every batch shape
the group path accepts — fuzzed over mixed point/line/polygon lefts vs
areal rights, including touching, overlapping, nested, holed, and
collinear-boundary configurations."""

import numpy as np
import pytest

from shapely_spark.geo import kernels as K
from shapely_spark.geo.geom import (
    LINESTRING, MULTIPOLYGON, POINT, POLYGON, Geometry,
)
from shapely_spark.geo.group_predicates import group_predicate
from shapely_spark.geo.wkt import from_wkt

PREDICATES = [
    "intersects", "within", "covered_by", "touches", "overlaps",
    "crosses", "contains", "covers", "contains_properly", "equals",
]


def _poly(coords):
    ring = list(coords) + [coords[0]]
    return Geometry(POLYGON, rings=[np.asarray(ring, dtype=np.float64)])


def _box(x0, y0, x1, y1):
    return _poly([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


def _diamond(cx, cy, r):
    return _poly([(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)])


def _line(coords):
    return Geometry(LINESTRING, coords=np.asarray(coords, dtype=np.float64))


def _point(x, y):
    return Geometry(POINT, coords=np.asarray([[x, y]], dtype=np.float64))


def _rand_poly(rng):
    kind = rng.integers(0, 4)
    cx, cy = rng.uniform(-5, 5, 2)
    if kind == 0:
        w, h = rng.uniform(0.5, 4, 2)
        return _box(cx, cy, cx + w, cy + h)
    if kind == 1:
        return _diamond(cx, cy, rng.uniform(0.5, 3))
    if kind == 2:  # n-gon
        k = int(rng.integers(5, 9))
        r = rng.uniform(0.5, 3)
        th = np.linspace(0, 2 * np.pi, k, endpoint=False) + rng.uniform(0, 1)
        return _poly(list(zip(cx + r * np.cos(th), cy + r * np.sin(th))))
    # holed box
    w = rng.uniform(2, 4)
    shell = [(cx, cy), (cx + w, cy), (cx + w, cy + w), (cx, cy + w), (cx, cy)]
    m = w / 4
    hole = [(cx + m, cy + m), (cx + m, cy + 2 * m), (cx + 2 * m, cy + 2 * m),
            (cx + 2 * m, cy + m), (cx + m, cy + m)]
    return Geometry(POLYGON, rings=[np.asarray(shell, dtype=np.float64),
                                    np.asarray(hole, dtype=np.float64)])


def _rand_left(rng):
    kind = rng.integers(0, 6)
    if kind == 0:
        return _point(*rng.uniform(-6, 6, 2))
    if kind == 1:
        a = rng.uniform(-6, 6, 2)
        b = a + rng.uniform(-3, 3, 2)
        c = b + rng.uniform(-3, 3, 2)
        return _line([tuple(a), tuple(b), tuple(c)])
    return _rand_poly(rng)


def _check_batch(lefts, right):
    for pred in PREDICATES:
        got = group_predicate(pred, lefts, right)
        assert got is not None, pred
        want = np.array([
            g is not None and bool(getattr(K, pred)(g, right))
            for g in lefts])
        mism = np.nonzero(got != want)[0]
        assert not len(mism), (
            pred, [(int(i), bool(got[i]), bool(want[i])) for i in mism])


def test_adversarial_configurations():
    right = _box(0, 0, 4, 4)
    lefts = [
        _box(0, 0, 4, 4),            # equal
        _box(1, 1, 3, 3),            # strictly inside
        _box(-2, -2, 6, 6),          # strictly contains
        _box(4, 0, 8, 4),            # edge-adjacent (touches)
        _box(4, 4, 8, 8),            # corner touch
        _box(2, 2, 6, 6),            # overlaps
        _box(5, 5, 6, 6),            # disjoint (bbox-near)
        _box(0, 0, 4, 2),            # shares part of boundary, inside
        _box(-1, 0, 5, 4),           # contains with collinear top/bottom
        _diamond(2, 2, 1),           # inside, non-rect
        _diamond(4, 2, 1),           # vertex on edge, half outside
        _diamond(2, 2, 6),           # diamond strictly containing the box? (|2|+|2|=4<6)
        _line([(1, 1), (3, 3)]),     # line inside
        _line([(0, 0), (4, 4)]),     # corner-to-corner diagonal (inside, ends on ∂)
        _line([(-1, 2), (5, 2)]),    # crosses through
        _line([(0, -1), (0, 5)]),    # collinear with left edge
        _line([(-2, -2), (-1, -1)]),  # disjoint
        _line([(4, 0), (4, 4)]),     # lies along right edge (touches)
        _point(2, 2),                # interior point
        _point(4, 2),                # boundary point
        _point(9, 9),                # far point
        None,                        # null left
        _box(1, 1, 1.5, 1.5),        # small inside
    ]
    _check_batch(lefts, right)


def test_holed_right_configurations():
    right = from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (3 3, 7 3, 7 7, 3 7, 3 3))")
    lefts = [
        _box(4, 4, 6, 6),      # inside the hole (exterior of R)
        _box(1, 1, 2, 2),      # inside the solid part
        _box(2, 2, 8, 8),      # blankets the hole (not covered_by)
        _box(3, 3, 7, 7),      # exactly the hole (touches from inside)
        _box(-1, -1, 11, 11),  # contains R — hole must break covered_by
        _line([(4, 4), (6, 6)]),   # line inside hole
        _line([(1, 1), (9, 1)]),   # line through solid part
        _line([(1, 5), (9, 5)]),   # line transiting the hole
        _point(5, 5),              # point in hole
        _diamond(5, 5, 1),         # diamond in hole
        _diamond(5, 1.5, 1),       # diamond in solid band
    ]
    _check_batch(lefts, right)


def test_multipolygon_right_gap_bridge():
    # two disjoint squares as one multipolygon; lefts bridging the gap
    right = from_wkt(
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)),"
        " ((4 0, 6 0, 6 2, 4 2, 4 0)))")
    lefts = [
        _box(1, 0, 5, 2),          # bridges the gap — not covered_by
        _box(0, 0, 2, 2),          # equals one part
        _line([(2, 1), (4, 1)]),   # gap bridge line, endpoints on parts
        _box(2, 0, 4, 2),          # fills exactly the gap (touches both)
        _box(-1, -1, 7, 3),        # contains both parts
    ]
    _check_batch(lefts, right)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_group_equals_scalar(seed):
    rng = np.random.default_rng(seed)
    for _round in range(8):
        right = _rand_poly(rng)
        lefts = [_rand_left(rng) for _ in range(24)]
        # salt with exact copies / translates of the right polygon
        lefts.append(right)
        _check_batch(lefts, right)


def test_multipolygon_lefts():
    right = _box(0, 0, 4, 4)
    mp = Geometry(MULTIPOLYGON, parts=[_box(1, 1, 2, 2), _box(5, 5, 6, 6)])
    mp_in = Geometry(MULTIPOLYGON, parts=[_box(1, 1, 2, 2), _box(3, 3, 3.5, 3.5)])
    _check_batch([mp, mp_in], right)


def test_zero_area_right_part_has_empty_interior():
    """Invalid (zero-area) polygon parts: reference semantics are
    undefined; the group path's defined behavior is interior = EMPTY, so
    a boundary-only contact reads as touches and never as overlap. The
    verified-interior rep-point guard is what enforces this."""
    deg = _poly([(0, 0), (2, 0), (4, 0)])      # collinear, zero area
    box = _box(0, 0, 4, 4)                      # deg lies on its bottom edge
    crossed = _box(1, -1, 3, 1)                 # deg transits its interior
    away = _box(6, 6, 7, 7)
    # int(deg) = ∅, so the DE-9IM II cell is F against EVERYTHING: any
    # nonempty intersection — even deg transiting crossed's interior —
    # reads as touches, and overlaps is impossible
    got_t = group_predicate("touches", [box, crossed, away], deg)
    assert got_t.tolist() == [True, True, False]
    got_i = group_predicate("intersects", [box, crossed, away], deg)
    assert got_i.tolist() == [True, True, False]
    got_o = group_predicate("overlaps", [box, crossed, away], deg)
    assert got_o.tolist() == [False, False, False]
