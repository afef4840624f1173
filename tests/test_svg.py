"""SVG output parity (reference: shapely/tests/legacy/test_svg.py —
expected strings copied verbatim) plus parallel_offset and the legacy
vectorized module."""

from xml.dom.minidom import parseString as parse_xml_string

import numpy as np
import pytest

from shapely_spark.geo import (
    GeometryCollection, LineString, MultiLineString, MultiPoint,
    MultiPolygon, Point, Polygon,
)


def assert_svg(geom, expected, **kw):
    el = geom.svg(**kw)
    parse_xml_string(el)          # element is valid XML
    parse_xml_string(geom._repr_svg_())  # document is valid XML
    assert el == expected


def test_point_svg():
    assert_svg(Point(), "<g />")
    g = Point(6, 7)
    assert_svg(
        g,
        '<circle cx="6.0" cy="7.0" r="3.0" stroke="#555555" '
        'stroke-width="1.0" fill="#66cc99" opacity="0.6" />',
    )
    assert_svg(
        g,
        '<circle cx="6.0" cy="7.0" r="15.0" stroke="#555555" '
        'stroke-width="5.0" fill="#66cc99" opacity="0.6" />',
        scale_factor=5,
    )


def test_multipoint_svg():
    assert_svg(MultiPoint(), "<g />")
    assert_svg(
        MultiPoint([(6, 7), (3, 4)]),
        '<g><circle cx="6.0" cy="7.0" r="3.0" stroke="#555555" '
        'stroke-width="1.0" fill="#66cc99" opacity="0.6" />'
        '<circle cx="3.0" cy="4.0" r="3.0" stroke="#555555" '
        'stroke-width="1.0" fill="#66cc99" opacity="0.6" /></g>',
    )


def test_linestring_svg():
    assert_svg(LineString(), "<g />")
    assert_svg(
        LineString([(5, 8), (496, -6), (530, 20)]),
        '<polyline fill="none" stroke="#66cc99" stroke-width="2.0" '
        'points="5.0,8.0 496.0,-6.0 530.0,20.0" opacity="0.8" />',
    )


def test_multilinestring_svg():
    assert_svg(
        MultiLineString([[(6, 7), (3, 4)], [(2, 8), (9, 1)]]),
        '<g><polyline fill="none" stroke="#66cc99" stroke-width="2.0" '
        'points="6.0,7.0 3.0,4.0" opacity="0.8" />'
        '<polyline fill="none" stroke="#66cc99" stroke-width="2.0" '
        'points="2.0,8.0 9.0,1.0" opacity="0.8" /></g>',
    )


def test_polygon_svg():
    assert_svg(Polygon(), "<g />")
    g = Polygon(
        [(35, 10), (45, 45), (15, 40), (10, 20), (35, 10)],
        [[(20, 30), (35, 35), (30, 20), (20, 30)]],
    )
    assert_svg(
        g,
        '<path fill-rule="evenodd" fill="#66cc99" stroke="#555555" '
        'stroke-width="2.0" opacity="0.6" d="M 35.0,10.0 L 45.0,45.0 L '
        "15.0,40.0 L 10.0,20.0 L 35.0,10.0 z M 20.0,30.0 L 35.0,35.0 L "
        '30.0,20.0 L 20.0,30.0 z" />',
    )
    # invalid polygon renders red
    assert_svg(
        Polygon([(0, 40), (0, 0), (40, 40), (40, 0), (0, 40)]),
        '<path fill-rule="evenodd" fill="#ff3333" stroke="#555555" '
        'stroke-width="2.0" opacity="0.6" d="M 0.0,40.0 L 0.0,0.0 L '
        '40.0,40.0 L 40.0,0.0 L 0.0,40.0 z" />',
    )


def test_multipolygon_svg():
    assert_svg(
        MultiPolygon(
            [
                Polygon([(40, 40), (20, 45), (45, 30), (40, 40)]),
                Polygon(
                    [(20, 35), (10, 30), (10, 10), (30, 5), (45, 20), (20, 35)],
                    [[(30, 20), (20, 15), (20, 25), (30, 20)]],
                ),
            ]
        ),
        '<g><path fill-rule="evenodd" fill="#66cc99" stroke="#555555" '
        'stroke-width="2.0" opacity="0.6" d="M 40.0,40.0 L 20.0,45.0 L '
        '45.0,30.0 L 40.0,40.0 z" />'
        '<path fill-rule="evenodd" fill="#66cc99" stroke="#555555" '
        'stroke-width="2.0" opacity="0.6" d="M 20.0,35.0 L 10.0,30.0 L '
        "10.0,10.0 L 30.0,5.0 L 45.0,20.0 L 20.0,35.0 z M 30.0,20.0 L "
        '20.0,15.0 L 20.0,25.0 L 30.0,20.0 z" /></g>',
    )


def test_collection_svg():
    assert_svg(GeometryCollection(), "<g />")
    assert_svg(
        GeometryCollection([Point(7, 3), LineString([(4, 2), (8, 4)])]),
        '<g><circle cx="7.0" cy="3.0" r="3.0" stroke="#555555" '
        'stroke-width="1.0" fill="#66cc99" opacity="0.6" />'
        '<polyline fill="none" stroke="#66cc99" stroke-width="2.0" '
        'points="4.0,2.0 8.0,4.0" opacity="0.8" /></g>',
    )


def test_repr_svg_document_shape():
    doc = Point(6, 7)._repr_svg_()
    assert doc.startswith('<svg xmlns="http://www.w3.org/2000/svg"')
    assert 'preserveAspectRatio="xMinYMin meet"' in doc
    assert "matrix(1,0,0,-1,0," in doc  # y-flip transform
    assert Point()._repr_svg_().endswith("/>")  # empty doc


def test_parallel_offset_legacy():
    """reference: shapely/geometry/linestring.py:185 — side= flips the
    sign, resolution= maps to quad_segs."""
    line = LineString([(0, 0), (10, 0)])
    left = line.parallel_offset(1.0, side="left")
    right = line.parallel_offset(1.0, side="right")
    assert left.equals_exact(line.offset_curve(1.0), 1e-12)
    assert right.equals_exact(line.offset_curve(-1.0), 1e-12)
    assert isinstance(left, LineString)


def test_vectorized_module():
    """reference: shapely/vectorized/__init__.py + legacy
    test_vectorized.py — element-wise point predicates with the
    deprecation pointer to contains_xy."""
    from shapely_spark.geo import vectorized as V
    from shapely_spark.geo.prepared import prep

    poly = Polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    x = np.array([[1.0, 5.0], [2.0, 0.0]])
    y = np.array([[1.0, 5.0], [2.0, 2.0]])
    with pytest.warns(DeprecationWarning):
        got = V.contains(poly, x, y)
    assert got.tolist() == [[True, False], [True, False]]  # edge not contained
    with pytest.warns(DeprecationWarning):
        tch = V.touches(poly, x, y)
    assert tch.tolist() == [[False, False], [False, True]]
    # prepared input unwraps; shapes must match
    with pytest.warns(DeprecationWarning):
        got2 = V.contains(prep(poly), x, y)
    assert (got2 == got).all()
    with pytest.raises(ValueError):
        with pytest.warns(DeprecationWarning):
            V.contains(poly, np.zeros(3), np.zeros(2))
    # non-polygonal geometry: scalar fallback
    ln = LineString([(0, 0), (10, 0)])
    with pytest.warns(DeprecationWarning):
        t = V.touches(ln, np.array([0.0, 5.0]), np.array([0.0, 0.0]))
    assert t.tolist() == [True, False]  # endpoint touches, interior doesn't
