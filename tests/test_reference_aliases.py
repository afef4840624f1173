"""Goldens for the r4 reference-name surface: boundary, prepared, the
scalar ragged-array interchange, the inspection/creation module
functions, and the shapely.ops veneer. Fixtures mirror the reference's
own docstring examples and shapely/tests/test_constructive.py /
test_prepared.py / test_ragged_array.py cases."""

import numpy as np
import pytest

from shapely_spark.geo import creation as CR
from shapely_spark.geo import inspection as INS
from shapely_spark.geo import kernels as K
from shapely_spark.geo import ops as OPS
from shapely_spark.geo.constructive import boundary, set_precision
from shapely_spark.geo.geom import (
    GEOMETRYCOLLECTION, box, geometrycollection, linearring, linestring,
    multilinestring, multipoint, multipolygon, point, polygon,
)
from shapely_spark.geo.prepared import PreparedGeometry, prep
from shapely_spark.geo.ragged import from_ragged_array, to_ragged_array
from shapely_spark.geo.wkt import from_wkt, to_wkt


class TestBoundary:
    """reference: shapely/constructive.py:92 docstring examples."""

    def test_point_and_multipoint_empty_collection(self):
        assert to_wkt(boundary(point(0, 0))) == "GEOMETRYCOLLECTION EMPTY"
        mp = multipoint([point(0, 0), point(1, 2)])
        assert to_wkt(boundary(mp)) == "GEOMETRYCOLLECTION EMPTY"

    def test_linestring_endpoints(self):
        ln = linestring([[0, 0], [1, 1], [1, 2]])
        assert to_wkt(boundary(ln)) == "MULTIPOINT ((0 0), (1 2))"

    def test_closed_ring_empty(self):
        r = linearring([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])
        assert to_wkt(boundary(r)) == "MULTIPOINT EMPTY"

    def test_polygon_shell_linestring(self):
        p = polygon([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])
        assert to_wkt(boundary(p)) == "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)"

    def test_multilinestring_mod2_and_sorted(self):
        ml = multilinestring([linestring([[0, 0], [1, 1]]),
                              linestring([[0, 1], [1, 0]])])
        assert to_wkt(boundary(ml)) == \
            "MULTIPOINT ((0 0), (0 1), (1 0), (1 1))"
        # mod-2: shared endpoint (1,1) appears twice -> interior point
        ml2 = multilinestring([linestring([[0, 0], [1, 1]]),
                               linestring([[1, 1], [2, 0]])])
        assert to_wkt(boundary(ml2)) == "MULTIPOINT ((0 0), (2 0))"

    def test_polygon_with_hole_multilinestring(self):
        p = polygon([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                    [[[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]])
        out = boundary(p)
        assert out.type_id == 5  # MULTILINESTRING
        assert len(out.parts) == 2
        assert K.length(out) == pytest.approx(16 + 4)

    def test_multipolygon_all_rings(self):
        mp = multipolygon([box(0, 0, 1, 1), box(5, 5, 7, 7)])
        out = boundary(mp)
        assert out.type_id == 5 and len(out.parts) == 2
        assert K.length(out) == pytest.approx(4 + 8)

    def test_geometrycollection_none(self):
        assert boundary(geometrycollection([point(0, 0)])) is None
        assert boundary(None) is None


class TestPrepared:
    """reference: shapely/prepared.py:8,72 + tests/test_prepared.py."""

    def test_prep_predicates(self):
        tri = polygon([[0, 0], [1, 1], [1, -1], [0, 0]])
        p = prep(tri)
        assert p.prepared and p.context is tri
        assert p.intersects(point(0.5, 0.5))
        assert p.contains(point(0.5, 0.0))
        assert not p.contains(point(5, 5))
        assert p.covers(point(0, 0))
        assert p.disjoint(point(-1, 0))
        assert p.within(box(-2, -2, 2, 2))
        assert p.touches(linestring([[0, 0], [-1, 0]]))
        assert p.crosses(linestring([[-1, 0], [2, 0]]))
        assert not p.overlaps(tri)

    def test_prep_of_prepared_shares_context(self):
        sq = box(0, 0, 1, 1)
        p = PreparedGeometry(PreparedGeometry(sq))
        assert p.context is sq

    def test_unpicklable(self):
        import pickle

        with pytest.raises(Exception):
            pickle.dumps(prep(box(0, 0, 1, 1)))


class TestRaggedArray:
    """reference: shapely/_ragged_array.py:159,417 — layout + roundtrip
    (tests/test_ragged_array.py fixtures)."""

    def test_points_with_missing_and_empty(self):
        geoms = [point(1, 2), None, from_wkt("POINT EMPTY"), point(3, 4)]
        typ, coords, offsets = to_ragged_array(geoms)
        assert int(typ) == 0 and offsets == () and coords.shape == (4, 2)
        assert np.isnan(coords[1]).all() and np.isnan(coords[2]).all()
        back = from_ragged_array(typ, coords, offsets)
        assert to_wkt(back[0]) == "POINT (1 2)"
        assert back[1].is_empty and back[2].is_empty
        assert to_wkt(back[3]) == "POINT (3 4)"

    def test_polygon_offsets_match_reference_docstring(self):
        # reference docstring: unit square -> offsets ([0, 5], [0, 1])
        p = polygon([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
        typ, coords, offsets = to_ragged_array([p])
        assert int(typ) == 3
        assert coords.shape == (5, 2)
        assert list(offsets[0]) == [0, 5] and list(offsets[1]) == [0, 1]
        assert offsets[0].dtype == np.int32  # small counts -> int32

    def test_mixed_single_multi_promotes(self):
        single = box(0, 0, 1, 1)
        multi = multipolygon([box(2, 2, 3, 3), box(5, 5, 6, 6)])
        typ, coords, offsets = to_ragged_array([single, multi, None])
        assert int(typ) == 6 and len(offsets) == 3
        back = from_ragged_array(typ, coords, offsets)
        assert [g.type_id for g in back] == [6, 6, 6]
        assert K.area(back[0]) == pytest.approx(1.0)
        assert K.area(back[1]) == pytest.approx(2.0)
        assert back[2].is_empty

    def test_linestring_and_multilinestring(self):
        ls = linestring([[0, 0], [1, 1], [2, 0]])
        typ, coords, offsets = to_ragged_array([ls, None])
        back = from_ragged_array(typ, coords, offsets)
        assert to_wkt(back[0]) == to_wkt(ls) and back[1].is_empty
        ml = multilinestring([linestring([[0, 0], [1, 1]]),
                              linestring([[2, 2], [3, 3]])])
        typ, coords, offsets = to_ragged_array([ls, ml])
        assert int(typ) == 5 and len(offsets) == 2
        back = from_ragged_array(typ, coords, offsets)
        assert K.length(back[1]) == pytest.approx(K.length(ml))

    def test_z_roundtrip(self):
        ls = from_wkt("LINESTRING Z (0 0 1, 1 1 2)")
        typ, coords, offsets = to_ragged_array([ls])
        assert coords.shape == (2, 3)
        back = from_ragged_array(typ, coords, offsets)
        assert back[0].has_z and back[0].coords[1][2] == 2.0

    def test_unsupported_mix_raises(self):
        with pytest.raises(ValueError, match="not supported"):
            to_ragged_array([point(0, 0), box(0, 0, 1, 1)])
        with pytest.raises(ValueError, match="offsets"):
            from_ragged_array(0, np.zeros((1, 2)), (np.array([0, 1]),))
        with pytest.raises(ValueError, match="offsets"):
            from_ragged_array(1, np.zeros((1, 2)))


class TestInspectionModule:
    """reference: shapely/_geometry.py + coordinates.py module functions."""

    def test_type_and_dimension(self):
        gc = geometrycollection([point(0, 0), box(0, 0, 1, 1)])
        assert INS.get_type_id(None) == -1
        assert INS.get_type_id(gc) == 7
        assert INS.get_dimensions(point(0, 0)) == 0
        assert INS.get_dimensions(linestring([[0, 0], [1, 1]])) == 1
        assert INS.get_dimensions(gc) == 2
        assert INS.get_coordinate_dimension(from_wkt("POINT Z (0 0 0)")) == 3
        assert INS.get_coordinate_dimension(None) == -1

    def test_srid_and_precision(self):
        g = INS.set_srid(point(1, 1), 4326)
        assert INS.get_srid(g) == 4326 and INS.get_srid(None) == -1
        assert INS.get_precision(point(1, 1)) == 0.0
        g2 = set_precision(point(1.234, 5.678), 0.5)
        assert INS.get_precision(g2) == 0.5
        assert to_wkt(g2) == "POINT (1 5.5)"

    def test_ring_and_point_accessors(self):
        p = polygon([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                    [[[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]])
        assert INS.get_num_interior_rings(p) == 1
        shell = INS.get_exterior_ring(p)
        assert shell.type_id == 2 and len(shell.coords) == 5
        hole = INS.get_interior_ring(p, 0)
        assert hole is not None and INS.get_interior_ring(p, 1) is None
        ln = linestring([[0, 0], [1, 1], [2, 2]])
        assert INS.get_num_points(ln) == 3
        assert to_wkt(INS.get_point(ln, -1)) == "POINT (2 2)"
        assert INS.get_point(ln, 5) is None

    def test_parts_rings_coordinates(self):
        mp = multipolygon([box(0, 0, 1, 1), box(2, 2, 3, 3)])
        parts, idx = INS.get_parts([mp, None, box(9, 9, 10, 10)],
                                   return_index=True)
        assert len(parts) == 3 and list(idx) == [0, 0, 2]
        rings = INS.get_rings(box(0, 0, 1, 1))
        assert len(rings) == 1 and rings[0].type_id == 2
        coords, cidx = INS.get_coordinates(
            [point(1, 2), linestring([[0, 0], [1, 1]])], return_index=True)
        assert coords.shape == (3, 2) and list(cidx) == [0, 1, 1]
        z = INS.get_coordinates(from_wkt("POINT Z (1 2 3)"), include_z=True)
        assert z.tolist() == [[1.0, 2.0, 3.0]]
        assert INS.count_coordinates([point(0, 0), None, box(0, 0, 1, 1)]) == 6

    def test_transform_module_function(self):
        out = INS.transform(point(1, 2), lambda c: c + 10)
        assert to_wkt(out) == "POINT (11 12)"
        outs = INS.transform([point(1, 2), None], lambda c: c * 2)
        assert to_wkt(outs[0]) == "POINT (2 4)" and outs[1] is None


class TestCreationModule:
    """reference: shapely/creation.py module functions."""

    def test_points(self):
        out = CR.points([[0, 1], [2, 3]])
        assert [to_wkt(g) for g in out] == ["POINT (0 1)", "POINT (2 3)"]
        assert to_wkt(CR.points([1, 2])) == "POINT (1 2)"
        out = CR.points([0, 1], y=[5, 6])
        assert to_wkt(out[1]) == "POINT (1 6)"

    def test_linestrings_with_indices(self):
        coords = [[0, 0], [1, 1], [5, 5], [6, 6], [7, 7]]
        out = CR.linestrings(coords, indices=[0, 0, 1, 1, 1])
        assert len(out) == 2
        assert to_wkt(out[0]) == "LINESTRING (0 0, 1 1)"
        assert len(out[1].coords) == 3

    def test_polygons_with_grouped_holes(self):
        # reference shapely/creation.py:347-355 — with indices= the holes
        # ride INSIDE geometries: first ring per index is the shell,
        # subsequent rings of that index are its holes
        shell_a = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
        hole_a = [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]
        shell_b = [[10, 10], [14, 10], [14, 14], [10, 14], [10, 10]]
        out = CR.polygons([shell_a, hole_a, shell_b], indices=[0, 0, 1])
        assert K.area(out[0]) == pytest.approx(15.0)
        assert K.area(out[1]) == pytest.approx(16.0)
        # holes= without indices: one hole list per shell
        out = CR.polygons([shell_a, shell_b], holes=[[hole_a], []])
        assert K.area(out[0]) == pytest.approx(15.0)
        assert K.area(out[1]) == pytest.approx(16.0)
        # a bare coordinate array is ONE shell (reference example :385)
        single = CR.polygons(shell_a)
        assert K.area(single) == pytest.approx(16.0)
        # reference :346 — holes must not be combined with indices
        with pytest.raises(ValueError):
            CR.polygons([shell_a], holes=[[hole_a]], indices=[0])
        # reference :353 — missing indices raise
        with pytest.raises(ValueError):
            CR.polygons([shell_a, shell_b], indices=[0, 2])
        with pytest.raises(ValueError):
            CR.multipoints([point(0, 0), point(1, 1)], indices=[0, 2])

    def test_polygons_indices_none_handling(self):
        # reference shapely/tests/test_creation_indices.py::test_polygons —
        # None rings skip inside their group; an all-None group is an
        # EMPTY polygon at that slot, not a dropped slot
        ring = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
        hole = [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]
        out = CR.polygons([None, ring], indices=[0, 1])
        assert out[0].is_empty and K.area(out[1]) == pytest.approx(16.0)
        out = CR.polygons([None, ring, None, None], indices=[0, 0, 1, 1])
        assert K.area(out[0]) == pytest.approx(16.0) and out[1].is_empty
        out = CR.polygons([ring, hole, None, hole, ring],
                          indices=[0, 0, 0, 0, 1])
        assert K.area(out[0]) == pytest.approx(14.0)  # two holes excised
        assert K.area(out[1]) == pytest.approx(16.0)
        # negative / wrong-typed indices raise
        # (reference test_invalid_indices_collections)
        with pytest.raises(ValueError):
            CR.polygons([ring], indices=[-1])
        with pytest.raises((TypeError, ValueError)):
            CR.multipoints([point(0, 0)], indices=" h")
        # incompatible part types raise TypeError
        # (reference test_incompatible_types)
        with pytest.raises(TypeError):
            CR.polygons([point(0, 0)], indices=[0])
        with pytest.raises(TypeError):
            CR.multipoints([linestring([[0, 0], [1, 1]])], indices=[0])
        with pytest.raises(TypeError):
            CR.multipolygons([point(0, 0)], indices=[0])

    def test_multis_with_indices(self):
        pts = [point(0, 0), point(1, 1), point(2, 2)]
        out = CR.multipoints(pts, indices=[0, 0, 1])
        assert [g.num_geometries() for g in out] == [2, 1]
        out = CR.multipolygons([box(0, 0, 1, 1), box(2, 2, 3, 3)])
        assert out.type_id == 6 if hasattr(out, "type_id") else True
        gcs = CR.geometrycollections([point(0, 0), box(0, 0, 1, 1)],
                                     indices=[0, 0])
        assert gcs[0].type_id == GEOMETRYCOLLECTION


class TestOpsModule:
    """reference: shapely/ops.py veneer."""

    def test_linemerge_accepts_sequences_and_directed(self):
        a = linestring([[0, 0], [1, 1]])
        b = linestring([[2, 2], [1, 1]])
        merged = OPS.linemerge([a, b])
        assert merged.type_id == 1 and len(merged.coords) == 3
        # directed: b would need reversal, so no merge
        out = OPS.linemerge([a, b], directed=True)
        assert out.type_id == 5 and len(out.parts) == 2

    def test_orient_sign(self):
        cw = polygon([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]])  # clockwise
        assert K.is_ccw(linearring(OPS.orient(cw).rings[0]))
        assert not K.is_ccw(linearring(OPS.orient(cw, -1.0).rings[0]))

    def test_ops_transform_column_style(self):
        out = OPS.transform(lambda x, y: (x + 1, y * 2), point(1, 2))
        assert to_wkt(out) == "POINT (2 4)"

    def test_triangulate_returns_list(self):
        tris = OPS.triangulate(multipoint(
            [point(0, 0), point(1, 0), point(0, 1), point(1, 1)]))
        assert isinstance(tris, list) and len(tris) == 2
        assert sum(K.area(t) for t in tris) == pytest.approx(1.0)

    def test_operator_singleton(self):
        assert OPS.operator.linemerge is not None
        u = OPS.unary_union([box(0, 0, 1, 1), box(1, 0, 2, 1)])
        assert K.area(u) == pytest.approx(2.0)


class TestCodecArrayBroadcast:
    """reference: shapely/io.py — every codec accepts 'Geometry or
    array_like' and broadcasts elementwise (ufunc semantics). The scalar
    engine paths are unchanged; array input returns an object ndarray."""

    def test_wkt_wkb_roundtrip_array(self):
        import numpy as np

        from shapely_spark.geo.wkb import from_wkb, to_wkb
        from shapely_spark.geo.wkt import from_wkt as fwkt

        gs = fwkt(["POINT (1 2)", "LINESTRING (0 0, 1 1)", None])
        assert isinstance(gs, np.ndarray) and gs.dtype == object
        assert gs[2] is None
        back = from_wkb(to_wkb(gs))
        assert [None if g is None else to_wkt(g) for g in back] == [
            "POINT (1 2)", "LINESTRING (0 0, 1 1)", None]

    def test_from_wkb_hex_string(self):
        from shapely_spark.geo.wkb import from_wkb, to_wkb

        h = to_wkb(point(1, 2), hex=True)
        assert isinstance(h, str)
        assert to_wkt(from_wkb(h)) == "POINT (1 2)"

    def test_array_on_invalid_per_element(self):
        from shapely_spark.geo.wkb import from_wkb, to_wkb
        from shapely_spark.geo.wkt import from_wkt as fwkt

        ok = to_wkb(point(3, 4))
        r = from_wkb([b"\x00", ok], on_invalid="ignore")
        assert r[0] is None and to_wkt(r[1]) == "POINT (3 4)"
        r2 = fwkt(["POINT (1 2)", "NOPE(("], on_invalid="ignore")
        assert r2[1] is None and r2[0] is not None

    def test_geojson_array(self):
        from shapely_spark.geo.geojson import from_geojson, to_geojson

        js = to_geojson([point(1, 2), None])
        assert js[1] is None
        assert to_wkt(from_geojson(js)[0]) == "POINT (1 2)"
