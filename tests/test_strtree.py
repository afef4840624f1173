"""STRtree golden tests — fixtures and expected index pairs ported from the
reference suite (shapely/tests/test_strtree.py:24-50 fixtures; expectations
from the test_query_* parameterizations cited per case)."""

import math

import numpy as np
import pytest

from shapely_spark.geo import STRtree, box, empty, linestring, multipoint, point
from shapely_spark.geo import constructive as C
from shapely_spark.geo.geom import POINT

HALF_UNIT_DIAG = math.sqrt(2) / 2  # test_strtree.py:24
EPS = 1e-9  # test_strtree.py:25


@pytest.fixture(scope="module")
def tree():
    # test_strtree.py:28-31 — 10 points (i, i)
    return STRtree([point(i, i) for i in range(10)])


@pytest.fixture(scope="module")
def line_tree():
    # test_strtree.py:34-40 — 10 segments (i,i)→(i+1,i+1)
    return STRtree([linestring([(i, i), (i + 1, i + 1)]) for i in range(10)])


@pytest.fixture(scope="module")
def poly_tree():
    # test_strtree.py:43-50 — buffered circles, quad_segs=32
    return STRtree([C.buffer(point(i, i), HALF_UNIT_DIAG + EPS, quad_segs=32) for i in range(10)])


def pairs(res):
    return [tuple(c) for c in np.asarray(res).T.tolist()]


def test_build_skips_none_and_empty():
    # test_strtree.py:56-66
    assert len(STRtree([])) == 0
    assert len(STRtree([point(2, 3)])) == 1
    assert len(STRtree([None])) == 0
    assert len(STRtree([point(2, 3), None])) == 1
    assert len(STRtree([empty(POINT), point(2, 3), None])) == 1
    # index positions preserved: the valid geom is at original index 1
    t = STRtree([empty(POINT), point(2, 3)])
    assert t.query(box(0, 0, 5, 5)).tolist() == [1]


# ---- query without predicate (envelope semantics) -------------------------

def test_query_points_envelope(tree):
    # test_strtree.py:243-247
    assert sorted(tree.query(C.buffer(point(3, 3), 1)).tolist()) == [2, 3, 4]
    assert sorted(tree.query(multipoint([(5, 7), (7, 5)])).tolist()) == [5, 6, 7]


def test_query_lines_envelope(line_tree):
    assert line_tree.query(point(0, 0)).tolist() == [0]
    assert line_tree.query(point(0.5, 0.5)).tolist() == [0]
    assert line_tree.query(point(0, 0.5)).tolist() == [0]  # envelope hit only
    assert sorted(line_tree.query(point(1, 1)).tolist()) == [0, 1]
    assert sorted(line_tree.query(box(0, 0, 1, 1)).tolist()) == [0, 1]
    assert sorted(line_tree.query(C.buffer(point(3, 3), 0.5)).tolist()) == [2, 3]
    assert sorted(line_tree.query(multipoint([(5, 7), (7, 5)])).tolist()) == [4, 5, 6, 7]


def test_query_polys_envelope(poly_tree):
    assert sorted(poly_tree.query(point(0.5, 0.5)).tolist()) == [0, 1]
    assert sorted(poly_tree.query(point(1, 1)).tolist()) == [1]
    assert sorted(poly_tree.query(box(0, 0, 1, 1)).tolist()) == [0, 1]
    assert sorted(poly_tree.query(box(0, 0, 1.5, 1.5)).tolist()) == [0, 1, 2]
    assert sorted(poly_tree.query(C.buffer(point(3, 3), HALF_UNIT_DIAG)).tolist()) == [2, 3, 4]
    assert sorted(poly_tree.query(C.buffer(point(3, 3), 3 * HALF_UNIT_DIAG)).tolist()) == [1, 2, 3, 4, 5]
    assert sorted(poly_tree.query(multipoint([(5, 7), (7, 5)])).tolist()) == [5, 6, 7]


def test_query_array_input(tree):
    # test_strtree.py:447+ — array input returns (2, n) [input_idx, tree_idx]
    res = tree.query([box(0, 0, 1, 1), box(100, 100, 110, 110), box(3, 3, 6, 6)],
                     predicate="intersects")
    assert pairs(res) == [(0, 0), (0, 1), (2, 3), (2, 4), (2, 5), (2, 6)]


def test_query_invalid_predicate(tree):
    with pytest.raises(ValueError):
        tree.query(point(1, 1), predicate="bad_predicate")
    with pytest.raises(ValueError):
        tree.query(point(1, 1), predicate="disjoint")


# ---- query with predicates (test_strtree.py:338-348 prepared-inputs table) -

@pytest.mark.parametrize(
    "predicate,expected",
    [
        ("intersects", [0, 1, 2]),
        ("within", []),
        ("contains", [1]),
        ("overlaps", []),
        ("crosses", []),
        ("covers", [0, 1, 2]),
        ("covered_by", []),
        ("contains_properly", [1]),
    ],
)
def test_query_box_vs_points(tree, predicate, expected):
    geom = box(0, 0, 2, 2)
    assert sorted(tree.query(geom, predicate=predicate).tolist()) == expected


def test_query_intersects_points(tree):
    # test_strtree.py:396-447
    assert tree.query(point(0.5, 0.5), predicate="intersects").tolist() == []
    assert tree.query(point(1, 1), predicate="intersects").tolist() == [1]
    assert sorted(tree.query(box(3, 3, 6, 6), predicate="intersects").tolist()) == [3, 4, 5, 6]
    assert tree.query(C.buffer(point(3, 3), 1), predicate="intersects").tolist() == [3]
    assert sorted(
        tree.query(C.buffer(point(3, 3), 3 * HALF_UNIT_DIAG), predicate="intersects").tolist()
    ) == [2, 3, 4]
    assert sorted(tree.query(multipoint([(5, 5), (7, 7)]), predicate="intersects").tolist()) == [5, 7]
    assert tree.query(multipoint([(5, 7), (7, 5)]), predicate="intersects").tolist() == []
    assert tree.query(multipoint([(5, 7), (7, 7)]), predicate="intersects").tolist() == [7]


def test_query_intersects_lines(line_tree):
    # test_strtree.py:451-487
    assert line_tree.query(point(0, 0), predicate="intersects").tolist() == [0]
    assert line_tree.query(point(0.5, 0.5), predicate="intersects").tolist() == [0]
    assert line_tree.query(point(0, 0.5), predicate="intersects").tolist() == []
    assert sorted(line_tree.query(point(1, 1), predicate="intersects").tolist()) == [0, 1]
    assert sorted(line_tree.query(box(0, 0, 1, 1), predicate="intersects").tolist()) == [0, 1]


def test_query_intersects_polygons(poly_tree):
    # midpoint between two circle centers intersects both (fixture design,
    # test_strtree.py:43-50)
    assert sorted(poly_tree.query(point(0.5, 0.5), predicate="intersects").tolist()) == [0, 1]
    assert poly_tree.query(point(1, 1), predicate="intersects").tolist() == [1]


def test_query_dwithin(tree):
    res = tree.query(point(3, 3), predicate="dwithin", distance=1.5)
    assert sorted(res.tolist()) == [2, 3, 4]
    res = tree.query(point(3, 3), predicate="dwithin", distance=0.5)
    assert res.tolist() == [3]
    with pytest.raises(ValueError):
        tree.query(point(3, 3), predicate="dwithin")


# ---- nearest / query_nearest (test_strtree.py:1637-1867 semantics) --------

def test_nearest(tree):
    assert tree.nearest(point(3.4, 3.4)) == 3
    assert tree.nearest(point(7.6, 7.6)) == 8


def test_query_nearest_ties_all_matches(tree):
    # equidistant between 3 and 4 → both returned, sorted
    idx, dist = tree.query_nearest(point(3.5, 3.5), return_distance=True)
    assert idx.tolist() == [3, 4]
    np.testing.assert_allclose(dist, [HALF_UNIT_DIAG, HALF_UNIT_DIAG])


def test_query_nearest_max_distance(tree):
    idx = tree.query_nearest(point(3.2, 3.2), max_distance=10.0)
    assert idx.tolist() == [3]
    idx = tree.query_nearest(point(50, 50), max_distance=1.0)
    assert idx.tolist() == []


def test_query_nearest_exclusive(tree):
    idx = tree.query_nearest(point(3, 3), exclusive=True)
    assert sorted(idx.tolist()) == [2, 4]
    idx = tree.query_nearest(point(3, 3), exclusive=False)
    assert idx.tolist() == [3]


def test_query_nearest_array(tree):
    res, dist = tree.query_nearest([point(0.1, 0.1), point(8.9, 8.9)], return_distance=True)
    assert pairs(res) == [(0, 0), (1, 9)]
    np.testing.assert_allclose(dist, [0.1 * math.sqrt(2), 0.1 * math.sqrt(2)])


def test_large_tree_query_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = [point(x, y) for x, y in rng.uniform(0, 100, (500, 2))]
    t = STRtree(pts, node_capacity=10)
    q = box(20, 20, 40, 40)
    got = sorted(t.query(q, predicate="intersects").tolist())
    want = sorted(
        i for i, p in enumerate(pts)
        if 20 <= p.coords[0, 0] <= 40 and 20 <= p.coords[0, 1] <= 40
    )
    assert got == want
