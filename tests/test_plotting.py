"""Plotting parity (reference shapely/tests/test_plotting.py).

The geometry→path assembly is matplotlib-free (polygon_path_arrays /
line_path_arrays) and tested directly; the artist-level tests mirror
the reference suite and skip when matplotlib is absent, exactly as the
reference does (`pytest.importorskip("matplotlib")`)."""

import numpy as np
import pytest

from shapely_spark.geo import box, from_wkt
from shapely_spark.geo.plotting import (
    CLOSEPOLY,
    LINETO,
    MOVETO,
    line_path_arrays,
    polygon_path_arrays,
)


class TestPathArrays:
    def test_box_path_ccw(self):
        poly = box(0, 0, 1, 1)
        verts, codes = polygon_path_arrays(poly)
        assert verts.shape == (5, 2)
        assert codes[0] == MOVETO and (codes[1:] == LINETO).all()
        # exterior oriented CCW (signed area > 0)
        x, y = verts[:, 0], verts[:, 1]
        area2 = np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
        assert area2 > 0

    def test_polygon_with_hole_compound(self):
        poly = from_wkt(
            "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,5 2,5 5,2 5,2 2))")
        verts, codes = polygon_path_arrays(poly)
        starts = np.flatnonzero(codes == MOVETO)
        assert list(starts) == [0, 5]  # two rings, 5 vertices each
        # hole oriented CW (signed area < 0)
        hx, hy = verts[5:, 0], verts[5:, 1]
        area2 = np.sum(hx[:-1] * hy[1:] - hx[1:] * hy[:-1])
        assert area2 < 0
        assert CLOSEPOLY not in codes  # reference builds open compound paths

    def test_multipolygon_compound(self):
        mp = from_wkt(
            "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((2 2,3 2,3 3,2 3,2 2)))")
        verts, codes = polygon_path_arrays(mp)
        assert (codes == MOVETO).sum() == 2 and len(verts) == 10

    def test_line_and_multiline(self):
        line = from_wkt("LINESTRING(0 0,1 1,2 0)")
        verts, codes = line_path_arrays(line)
        assert np.allclose(verts, [[0, 0], [1, 1], [2, 0]])
        assert codes[0] == MOVETO and (codes[1:] == LINETO).all()
        ml = from_wkt("MULTILINESTRING((0 0,1 1),(2 2,3 3,4 4))")
        verts, codes = line_path_arrays(ml)
        assert (codes == MOVETO).sum() == 2 and len(verts) == 5

    def test_zm_coords_dropped(self):
        line = from_wkt("LINESTRING Z(0 0 5,1 1 6)")
        verts, _ = line_path_arrays(line)
        assert verts.shape == (2, 2)


class TestMatplotlibArtists:
    """Mirrors reference test_plotting.py; runs only where matplotlib
    exists (not this container — the path-array tests above cover the
    logic; these cover the artist wiring)."""

    @pytest.fixture(autouse=True)
    def _requires_matplotlib(self):
        pytest.importorskip("matplotlib")

    def test_patch_from_polygon(self):
        from shapely_spark.geo.plotting import patch_from_polygon

        artist = patch_from_polygon(box(0, 0, 1, 1), facecolor="red",
                                    edgecolor="blue", linewidth=3)
        assert artist.get_linewidth() == 3

    def test_plot_polygon_returns_pair(self):
        from shapely_spark.geo.plotting import plot_polygon

        patch, line = plot_polygon(box(0, 0, 1, 1))
        assert patch.get_path().vertices.shape == (5, 2)

    def test_plot_points(self):
        from shapely_spark.geo.plotting import plot_points

        line = plot_points(from_wkt("MULTIPOINT(0 0,1 1)"))
        assert len(line.get_xdata()) == 2
