"""Delaunay/Voronoi/polylabel + canonical form + clearance goldens.

The Delaunay/normalize expectations are the reference's own doctest goldens
(shapely/constructive.py:523-536; tests/test_constructive.py
test_normalize)."""

import numpy as np
import pytest

from shapely_spark.geo import kernels as K
from shapely_spark.geo.constructive import (
    intersection_all,
    minimum_clearance,
    normalize,
    shortest_line,
    symmetric_difference_all,
)
from shapely_spark.geo.geom import box, linestring, multilinestring, multipoint, polygon
from shapely_spark.geo.triangulate import (
    delaunay_triangles,
    maximum_inscribed_circle,
    polylabel,
    voronoi_polygons,
)
from shapely_spark.geo.wkt import to_wkt


class TestNormalize:
    def test_multilinestring_golden(self):
        # reference tests/test_constructive.py test_normalize
        ml = multilinestring([[(1, 1), (0, 0)], [(1, 1), (1, 2)]])
        assert to_wkt(normalize(ml), rounding_precision=0) == \
            "MULTILINESTRING ((1 1, 1 2), (0 0, 1 1))"

    def test_polygon_canonical(self):
        # reference doc golden constructive.py:523: shell CW from min vertex
        tri = polygon([(50, 30), (60, 30), (100, 100)])
        assert to_wkt(normalize(tri), rounding_precision=0) == \
            "POLYGON ((50 30, 100 100, 60 30, 50 30))"

    def test_idempotent(self):
        g = polygon([(3, 0), (0, 0), (0, 3)])
        n1 = normalize(g)
        n2 = normalize(n1)
        assert n1.equals_exact(n2, 0.0)


class TestDelaunay:
    def test_reference_doc_golden(self):
        mp = multipoint([(50, 30), (60, 30), (100, 100)])
        got = to_wkt(normalize(delaunay_triangles(mp)), rounding_precision=0)
        assert got == "GEOMETRYCOLLECTION (POLYGON ((50 30, 100 100, 60 30, 50 30)))"

    def test_tolerance_merges_vertices(self):
        mp = multipoint([(50, 30), (51, 30), (60, 30), (100, 100)])
        got = to_wkt(normalize(delaunay_triangles(mp, tolerance=2.0)),
                     rounding_precision=0)
        assert got == "GEOMETRYCOLLECTION (POLYGON ((50 30, 100 100, 60 30, 50 30)))"

    def test_grid_total_area_is_hull(self):
        pts = multipoint([(i, j) for i in range(4) for j in range(4)])
        dt = delaunay_triangles(pts)
        assert sum(K.area(p) for p in dt.parts) == pytest.approx(9.0)

    def test_only_edges(self):
        mp = multipoint([(0, 0), (1, 0), (0, 1)])
        e = delaunay_triangles(mp, only_edges=True)
        assert len(e.parts) == 3

    def test_collinear_empty(self):
        mp = multipoint([(0, 0), (1, 1), (2, 2)])
        dt = delaunay_triangles(mp)
        assert len(dt.parts) == 0


class TestVoronoi:
    def test_two_points_equal_cells(self):
        v = voronoi_polygons(multipoint([(0, 0), (2, 0)]))
        areas = sorted(K.area(p) for p in v.parts)
        assert len(areas) == 2
        assert areas[0] == pytest.approx(areas[1])

    def test_grid_cell_count_and_tiling(self):
        v = voronoi_polygons(multipoint([(i, j) for i in range(3) for j in range(3)]))
        assert len(v.parts) == 9
        # interior cell (around (1,1)) is the unit square [.5,1.5]²
        areas = sorted(K.area(p) for p in v.parts)
        assert min(areas) == pytest.approx(1.0)

    def test_extend_to(self):
        v = voronoi_polygons(multipoint([(0, 0), (2, 0)]), extend_to=box(-1, -1, 3, 1))
        total = sum(K.area(p) for p in v.parts)
        assert total == pytest.approx(8.0)  # cells tile the extend_to box


class TestPolylabel:
    def test_square_center(self):
        # reference parity: polylabel returns the POINT, not a tuple
        # (shapely/algorithms/polylabel.py returns Point)
        from shapely_spark.geo.triangulate import _polylabel_with_distance

        p = polylabel(box(0, 0, 4, 4), tolerance=0.01)
        assert p.type_id == 0  # POINT
        assert p.coords[0, 0] == pytest.approx(2.0, abs=0.05)
        _, d = _polylabel_with_distance(box(0, 0, 4, 4), tolerance=0.01)
        assert d == pytest.approx(2.0, abs=0.05)

    def test_holed(self):
        from shapely_spark.geo import overlay as O
        from shapely_spark.geo.triangulate import _polylabel_with_distance

        holed = O.difference(box(0, 0, 10, 10), box(1, 1, 9, 5))
        p, d = _polylabel_with_distance(holed, tolerance=0.05)
        assert K.contains(holed, p)
        assert d == pytest.approx(2.5, abs=0.1)  # widest band y∈[5,10] → depth 2.5
        assert K.contains(holed, polylabel(holed, tolerance=0.05))

    def test_max_inscribed_circle(self):
        mic = maximum_inscribed_circle(box(0, 0, 4, 2))
        assert K.length(mic) == pytest.approx(1.0, abs=0.05)


class TestClearanceShortestLine:
    def test_square_clearance(self):
        assert minimum_clearance(box(0, 0, 1, 1)) == pytest.approx(1.0)

    def test_point_inf(self):
        import math

        from shapely_spark.geo.geom import point

        assert minimum_clearance(point(1, 1)) == math.inf

    def test_shortest_line(self):
        sl = shortest_line(box(0, 0, 1, 1), box(3, 0, 4, 1))
        assert K.length(sl) == pytest.approx(2.0)

    def test_reduce_ops(self):
        gs = [box(0, 0, 4, 4), box(1, 1, 5, 5), box(2, 2, 6, 6)]
        assert K.area(intersection_all(gs)) == pytest.approx(4.0)
        a, b = box(0, 0, 2, 2), box(1, 1, 3, 3)
        assert K.area(symmetric_difference_all([a, b, a])) == pytest.approx(4.0)


class TestSplitSharedPaths:
    def test_split_polygon_by_line(self):
        from shapely_spark.geo import overlay as O

        parts = O.split(box(0, 0, 4, 4), linestring([(2, -1), (2, 5)]))
        areas = sorted(round(K.area(p), 6) for p in parts.parts)
        assert areas == [8.0, 8.0]

    def test_split_line_by_point(self):
        from shapely_spark.geo import overlay as O
        from shapely_spark.geo.geom import point

        parts = O.split(linestring([(0, 0), (4, 0)]), point(1, 0))
        assert sorted(round(K.length(p), 6) for p in parts.parts) == [1.0, 3.0]

    def test_split_line_by_line(self):
        from shapely_spark.geo import overlay as O

        parts = O.split(linestring([(0, 0), (4, 4)]), linestring([(0, 4), (4, 0)]))
        lens = [K.length(p) for p in parts.parts]
        assert len(lens) == 2 and lens[0] == pytest.approx(lens[1])

    def test_shared_paths_direction(self):
        from shapely_spark.geo import overlay as O

        a = linestring([(0, 0), (3, 0), (3, 1)])
        same, opp = O.shared_paths(a, linestring([(1, 0), (2, 0)])).parts
        assert sum(K.length(s) for s in same.parts) == pytest.approx(1.0)
        assert len(opp.parts) == 0
        same2, opp2 = O.shared_paths(a, linestring([(2, 0), (1, 0)])).parts
        assert len(same2.parts) == 0
        assert sum(K.length(s) for s in opp2.parts) == pytest.approx(1.0)


class TestSmallConstructive:
    def test_node_crossing(self):
        from shapely_spark.geo import overlay as O

        nd = O.node(multilinestring([[(0, 0), (2, 2)], [(0, 2), (2, 0)]]))
        assert len(nd.parts) == 4

    def test_concave_hull_ratio1_is_convex(self):
        from shapely_spark.geo import overlay as O

        pts = multipoint([(0, 0), (3, 0), (3, 3), (0, 3), (1.5, 0.2)])
        ch = O.concave_hull(pts, ratio=1.0)
        assert K.area(ch) == pytest.approx(9.0, abs=1e-6)

    def test_minimum_clearance_line_matches_value(self):
        from shapely_spark.geo.constructive import (
            minimum_clearance,
            minimum_clearance_line,
        )

        g = box(0, 0, 2, 1)
        assert K.length(minimum_clearance_line(g)) == pytest.approx(
            minimum_clearance(g)
        )

    def test_minimum_width(self):
        from shapely_spark.geo.constructive import minimum_width

        assert K.length(minimum_width(box(0, 0, 4, 1))) == pytest.approx(1.0)

    def test_force_3d_set_coordinates(self):
        from shapely_spark.geo.constructive import force_3d, set_coordinates

        g3 = force_3d(box(0, 0, 1, 1), z=5.0)
        assert g3.has_z and g3.rings[0].shape[1] == 3
        g = polygon([(0, 0), (2, 0), (2, 2), (0, 2)])
        c = g.all_coords().copy()
        c[:, 0] += 10
        g2 = set_coordinates(g, c)
        assert K.area(g2) == pytest.approx(4.0)
        assert K.bounds(g2)[0] == 10.0


class TestGeoJSON:
    def test_roundtrip_all_types(self):
        from shapely_spark.geo.geojson import from_geojson, to_geojson
        from shapely_spark.geo.geom import (
            geometrycollection,
            multilinestring,
            multipolygon,
            point,
        )

        zoo = [
            point(1.5, 2.5),
            linestring([(0, 0), (1, 1), (2, 0)]),
            polygon([(0, 0), (4, 0), (4, 4), (0, 4)], holes=[[(1, 1), (2, 1), (2, 2), (1, 2)]]),
            multipoint([(0, 0), (1, 1)]),
            multilinestring([[(0, 0), (1, 1)], [(2, 2), (3, 3)]]),
            multipolygon([box(0, 0, 1, 1), box(5, 5, 6, 6)]),
            geometrycollection([point(0, 0), box(1, 1, 2, 2)]),
        ]
        for g in zoo:
            g2 = from_geojson(to_geojson(g))
            assert g2.type_id == g.type_id
            assert np.allclose(g2.all_coords()[:, :2], g.all_coords()[:, :2])

    def test_feature_and_collection(self):
        from shapely_spark.geo.geojson import from_geojson

        f = '{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[1,2]}}'
        g = from_geojson(f)
        assert g.type_id == 0 and g.coords[0, 0] == 1.0
        fc = '{"type":"FeatureCollection","features":[' + f + "," + f + "]}"
        gc = from_geojson(fc)
        assert gc.type_id == 7 and len(gc.parts) == 2

    def test_invalid(self):
        from shapely_spark.geo.geojson import from_geojson

        with pytest.raises(ValueError):
            from_geojson('{"type":"Nope"}')
        assert from_geojson("not json", on_invalid="ignore") is None


class TestConstrainedDelaunay:
    def test_square_two_triangles(self):
        from shapely_spark.geo.triangulate import constrained_delaunay_triangles

        t = constrained_delaunay_triangles(box(0, 0, 2, 2))
        assert len(t.parts) == 2
        assert sum(K.area(p) for p in t.parts) == pytest.approx(4.0)

    def test_concave_preserves_area(self):
        from shapely_spark.geo.triangulate import constrained_delaunay_triangles

        L = polygon([(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)])
        t = constrained_delaunay_triangles(L)
        assert len(t.parts) == 4  # n-2 for a simple hexagon
        assert sum(K.area(p) for p in t.parts) == pytest.approx(K.area(L))

    def test_holed_triangles_stay_inside(self):
        from shapely_spark.geo import overlay as O
        from shapely_spark.geo.constructive import point_on_surface
        from shapely_spark.geo.triangulate import constrained_delaunay_triangles

        holed = O.difference(box(0, 0, 6, 6), box(2, 2, 4, 4))
        t = constrained_delaunay_triangles(holed)
        assert sum(K.area(p) for p in t.parts) == pytest.approx(32.0)
        for p in t.parts:
            assert K.covers(holed, point_on_surface(p))
