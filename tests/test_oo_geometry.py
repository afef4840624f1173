"""OO geometry-class veneer (geo/geometry.py) vs the reference's
shapely.geometry package semantics (point.py, polygon.py, geo.py,
base.py). Every OO member must agree with the module function it
delegates to — these tests pin construction semantics, delegation,
result re-tagging, GeoJSON interop (shape/mapping/__geo_interface__),
equality/hash, and the dataclasses.replace calling convention."""

import dataclasses
import math

import numpy as np
import pytest

from shapely_spark.geo import (
    CAP_STYLE, JOIN_STYLE, Geometry, GeometryCollection, GeometryTypeError,
    LinearRing, LineString, MultiLineString, MultiPoint, MultiPolygon,
    Point, Polygon, mapping, shape,
)
from shapely_spark.geo import constructive as C
from shapely_spark.geo import kernels as K
from shapely_spark.geo.wkt import from_wkt


SQ = [(0, 0), (1, 0), (1, 1), (0, 1)]


def test_top_level_reference_idiom():
    """reference 2.x: `from shapely import Point, box` works at top level."""
    import shapely_spark as ss

    assert ss.Point(1, 2).x == 1.0
    assert ss.box(0, 0, 2, 2).area == 4.0
    assert ss.shape({"type": "Point", "coordinates": [3, 4]}).y == 4.0
    assert ss.mapping(ss.Point(0, 1))["type"] == "Point"


class TestConstructors:
    def test_point_forms(self):
        assert Point(1, 2).x == 1.0
        assert Point((1, 2)).y == 2.0
        assert Point(np.array([1.0, 2.0])).x == 1.0
        assert Point(1, 2, 3).z == 3.0 and Point(1, 2, 3).has_z
        p = Point(Point(4, 5))
        assert (p.x, p.y) == (4.0, 5.0)
        # generator input (reference test_point.test_from_generator) and
        # the shapely-1.8 length-1 separate-array form (test_from_numpy_xy)
        g = Point(c for c in (3.0, 4.0))
        assert (g.x, g.y) == (3.0, 4.0)
        g = Point(np.array([1.0]), np.array([2.0]), np.array([3.0]))
        assert (g.x, g.y, g.z) == (1.0, 2.0, 3.0)
        g = Point([(3.0, 4.0)])  # single-row coordinate sequence
        assert (g.x, g.y) == (3.0, 4.0)
        assert Point().is_empty and not Point()
        with pytest.raises(ValueError):
            Point(1)
        with pytest.raises(GeometryTypeError):
            Point(LineString([(0, 0), (1, 1)]))

    def test_linestring_forms(self):
        ln = LineString([(0, 0), (3, 4)])
        assert ln.length == 5.0
        assert LineString([Point(0, 0), Point(3, 4)]).length == 5.0
        assert LineString(ln).length == 5.0
        assert LineString().is_empty and LineString([]).is_empty
        with pytest.raises(ValueError):
            LineString([(0, 0)])

    def test_linearring_autoclose(self):
        lr = LinearRing([(0, 0), (1, 0), (1, 1)])
        assert lr.is_closed and lr.is_ring
        assert lr.coord_tuples[0] == lr.coord_tuples[-1]
        assert isinstance(lr, LineString)  # reference subclassing

    def test_polygon_and_holes(self):
        sq = Polygon(SQ)
        assert sq.area == 1.0
        holed = Polygon([(0, 0), (4, 0), (4, 4), (0, 4)],
                        [[(1, 1), (2, 1), (2, 2), (1, 2)]])
        assert holed.area == 15.0
        assert len(holed.interiors) == 1
        assert holed.exterior.geom_type == "LinearRing"
        assert Polygon(LinearRing(SQ)).area == 1.0
        assert Polygon().is_empty

    def test_multis_and_collection(self):
        mp = MultiPoint([(0, 0), Point(1, 1)])
        assert [g.x for g in mp.geoms] == [0.0, 1.0]
        ml = MultiLineString([[(0, 0), (1, 0)], LineString([(0, 1), (1, 1)])])
        assert ml.length == 2.0
        mpoly = MultiPolygon([Polygon(SQ), ([(2, 0), (3, 0), (3, 1), (2, 1)], [])])
        assert mpoly.area == 2.0  # Polygon objects AND (shell, holes) tuples
        gc = GeometryCollection([Point(0, 0), Polygon(SQ)])
        assert [g.geom_type for g in gc.geoms] == ["Point", "Polygon"]
        assert MultiPoint().is_empty and GeometryCollection().is_empty

    def test_isinstance_chain(self):
        assert isinstance(Point(0, 1), Geometry)
        assert isinstance(Polygon(SQ).exterior, LinearRing)
        assert isinstance(Point(0, 0).buffer(1.0), Polygon)


class TestDelegation:
    """OO members equal the module functions they delegate to."""

    def test_scalar_properties(self):
        g = Polygon(SQ)
        assert g.area == K.area(g)
        assert g.length == K.length(g)
        assert g.bounds == tuple(map(float, K.bounds(g)))
        assert g.centroid.equals_exact(C.centroid(g), 0)
        assert g.convex_hull.area == K.area(C.convex_hull(g))
        assert g.is_valid and g.is_simple
        assert g.minimum_clearance == C.minimum_clearance(g)
        assert g.boundary.length == 4.0  # rings as lines

    def test_binary_predicates_match_kernels(self):
        a, b = Polygon(SQ), Point(0.5, 0.5)
        for name in ("intersects", "contains", "covers", "disjoint",
                     "touches", "crosses", "overlaps", "equals", "within",
                     "covered_by", "contains_properly"):
            assert getattr(a, name)(b) == getattr(K, name)(a, b), name
        assert a.relate(b) == "0F2FF1FF2"
        assert a.relate_pattern(b, "0********")
        assert a.dwithin(Point(2, 0.5), 1.5) == K.dwithin(a, Point(2, 0.5), 1.5)
        assert Point(0, 0).distance(Point(3, 4)) == 5.0
        assert a.hausdorff_distance(b) == K.hausdorff_distance(a, b)

    def test_set_ops_and_operators(self):
        a = Polygon(SQ)
        b = Polygon([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)])
        assert (a & b).area == pytest.approx(0.25)
        assert (a | b).area == pytest.approx(1.75)
        assert (a - b).area == pytest.approx(0.75)
        assert (a ^ b).area == pytest.approx(1.5)
        assert isinstance(a & b, Polygon)  # results re-tagged
        assert a.union(b, grid_size=0.0).area == pytest.approx(1.75)

    def test_unary_methods(self):
        line = LineString([(0, 0), (4, 0)])
        cap = line.buffer(1.0, cap_style=CAP_STYLE.flat,
                          join_style=JOIN_STYLE.bevel)
        assert cap.area == pytest.approx(8.0, rel=1e-6)
        zig = LineString([(0, 0), (1, 0.001), (2, 0)])
        assert len(zig.simplify(0.01).coord_tuples) == 2
        assert line.segmentize(1.0).coord_tuples == [
            (0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (4.0, 0.0)]
        assert line.reverse().coord_tuples[0] == (4.0, 0.0)
        assert Polygon(SQ).point_on_surface().within(Polygon(SQ))
        assert Polygon(SQ).representative_point().within(Polygon(SQ))
        bow = from_wkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
        assert bow.make_valid().area == pytest.approx(2.0)  # two 1.0 triangles

    def test_linear_referencing(self):
        ln = LineString([(0, 0), (10, 0)])
        assert ln.interpolate(2.5).x == 2.5
        assert ln.interpolate(0.5, normalized=True).x == 5.0
        assert ln.project(Point(3, 4)) == 3.0
        assert ln.project(Point(3, 4), normalized=True) == pytest.approx(0.3)

    def test_buffer_pi(self):
        assert Point(0, 0).buffer(1.0, quad_segs=64).area == pytest.approx(
            math.pi, rel=1e-3)


class TestGeoInterface:
    def test_mapping_shape_roundtrip_all_types(self):
        fixtures = [
            Point(1, 2),
            LineString([(0, 0), (1, 1)]),
            Polygon(SQ, [[(0.25, 0.25), (0.5, 0.25), (0.5, 0.5), (0.25, 0.5)]]),
            MultiPoint([(0, 0), (1, 1)]),
            MultiLineString([[(0, 0), (1, 0)], [(0, 1), (1, 1)]]),
            MultiPolygon([Polygon(SQ)]),
            GeometryCollection([Point(0, 0), LineString([(0, 0), (1, 1)])]),
        ]
        for g in fixtures:
            back = shape(mapping(g))
            assert back == g, g.geom_type
            assert type(back) is type(g)

    def test_geo_interface_and_feature(self):
        d = Point(0, 1).__geo_interface__
        assert d == {"type": "Point", "coordinates": [0.0, 1.0]}
        f = {"type": "Feature", "properties": {},
             "geometry": {"type": "Point", "coordinates": [2, 3]}}
        assert shape(f).x == 2.0
        assert shape(Point(5, 6)).y == 6.0  # objects with __geo_interface__

    def test_shape_empty_and_unknown(self):
        e = shape({"type": "Polygon", "coordinates": []})
        assert e.is_empty and e.geom_type == "Polygon"
        with pytest.raises(GeometryTypeError):
            shape({"type": "Hypercube", "coordinates": [[0, 0]]})

    def test_wkt_wkb_properties(self):
        p = Point(0.5, 2)
        assert p.wkt == "POINT (0.5 2)"
        assert str(p) == p.wkt
        assert p.wkb[:1] == b"\x01" and len(p.wkb) == 21
        assert bytes.fromhex(p.wkb_hex) == p.wkb


class TestEqualityHash:
    def test_structural_equality(self):
        assert Polygon(SQ) == Polygon(SQ)
        assert Polygon(SQ) != Polygon([(0, 0), (2, 0), (2, 2), (0, 2)])
        # same point set, different vertex order: NOT identical (== is
        # equals_identical, reference base.py __eq__), but .equals() is True
        rot = Polygon([(1, 0), (1, 1), (0, 1), (0, 0)])
        assert rot != Polygon(SQ) and rot.equals(Polygon(SQ))
        assert Point(1, 2) != "POINT (1 2)"  # non-geometry: unequal, no raise

    def test_hash_by_wkb(self):
        seen = {Point(1, 2): "a", Polygon(SQ): "b"}
        assert seen[Point(1, 2)] == "a"
        assert seen[Polygon(SQ)] == "b"
        assert hash(Point(1, 2)) != hash(Point(2, 1))

    def test_bool_is_nonempty(self):
        assert Point(1, 2) and not Point()
        assert Polygon(SQ) and not Polygon()


class TestDataclassCompat:
    def test_replace_on_typed_subclass(self):
        p = dataclasses.replace(Point(1, 2), srid=4326)
        assert p.srid == 4326 and p.x == 1.0

    def test_plain_geometry_results_retag_lazily(self):
        plain = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
        assert type(plain).__name__ in ("Geometry", "Polygon")
        assert isinstance(plain.centroid, Point)  # veneer works on plain too
        assert plain.buffer(0.1).area > 1.0

    def test_xy_and_coord_views(self):
        ln = LineString([(0, 0), (10, 5)])
        x, y = ln.xy
        assert list(x) == [0.0, 10.0] and list(y) == [0.0, 5.0]
        assert ln.coord_tuples == [(0.0, 0.0), (10.0, 5.0)]
        with pytest.raises(NotImplementedError):
            Polygon(SQ).coord_tuples  # reference: Polygon has no coords
        with pytest.raises(AttributeError):
            Point(0, 0).geoms
        with pytest.raises(AttributeError):
            Point(0, 0).exterior


def test_format_spec():
    """reference: shapely/tests/geometry/test_format.py — __format__ on
    geometry objects: '' → wkt, x/X → hex WKB, [0][.prec][fFgG] → WKT."""
    pt = Point(1, 2)
    assert f"{pt}" == pt.wkt
    assert format(pt, "") == pt.wkt
    assert format(pt, "x") == pt.wkb_hex.lower()
    assert format(pt, "X") == pt.wkb_hex.upper()
    xy1 = (0.12345678901234567, 1.2345678901234567e10)
    xy2 = (-169.910918, -18.997564)
    assert format(Point(*xy1), ".0f") == "POINT (0 12345678901)"
    assert format(Point(*xy1), ".1f") == "POINT (0.1 12345678901.2)"
    assert format(Point(*xy2), "0.2f") == "POINT (-169.91 -19.00)"
    assert format(Point(*xy2), "0.2g") == "POINT (-169.91 -19)"
    assert format(Point(float("inf"), -float("inf")), ".3F") == "POINT (INF -INF)"
    assert format(Point(*xy1), ".6G") == "POINT (0.123457 12345678901.234568)"
    assert format(Point(1, 2), "f") == f"POINT ({1:.16f} {2:.16f})"
    assert format(Point(630084, 4833438, 76), "g") == "POINT Z (630084 4833438 76)"
    for bad in ("5G", ".f", "0.2e", ".1x"):
        with pytest.raises(ValueError):
            format(pt, bad)


def test_line_intersection_z_interpolation():
    """reference: shapely/tests/legacy/test_products_z.py — Z of a
    lineal×lineal intersection point interpolates along the 3-D inputs."""
    l1 = LineString([(0, 0, 0), (1, 1, 1)])
    l2 = LineString([(0, 1, 1), (1, 0, 0)])
    x = l1.intersection(l2)
    assert x.has_z
    assert x.z == pytest.approx(0.5)
    # one-sided Z uses the z-carrying input alone
    y = LineString([(0, 0, 2), (1, 1, 2)]).intersection(LineString([(0, 1), (1, 0)]))
    assert y.has_z and y.z == pytest.approx(2.0)
    # 2-D inputs stay 2-D
    z = LineString([(0, 0), (1, 1)]).intersection(LineString([(0, 1), (1, 0)]))
    assert not z.has_z


def test_degenerate_polygon_singularity():
    """reference: shapely/tests/legacy/test_singularity.py — a polygon of
    one repeated point has point bounds, no crash."""
    p = (1.0, 1.0)
    assert Polygon([p, p, p]).bounds == (1.0, 1.0, 1.0, 1.0)
    assert Polygon([p, p, p, p, p]).bounds == (1.0, 1.0, 1.0, 1.0)
