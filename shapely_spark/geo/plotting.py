"""Plot single geometries using Matplotlib — reference parity for
``shapely/plotting.py`` (plot_polygon / plot_line / plot_points /
patch_from_polygon, same signatures, defaults, and return shapes).

Matplotlib is not present in every deployment (and not in this
container), so the geometry→path assembly — the part with actual logic —
is factored into matplotlib-free helpers (`polygon_path_arrays`,
`line_path_arrays`) returning (vertices, codes) in matplotlib
``Path`` code semantics. The plot_* wrappers import matplotlib lazily
and raise its ImportError untouched, exactly like the reference (which
defers `import matplotlib` to call time).

Reference: shapely/plotting.py:22 (_path_from_polygon compound path,
exterior oriented CCW via shapely.ops.orient), :62 plot_polygon
(color → facecolor alpha 0.3), :135 plot_line, :191 plot_points
(vertices of ANY geometry via get_coordinates).
"""

from __future__ import annotations

import numpy as np

from .constructive import orient_polygons
from .geom import MULTILINESTRING, MULTIPOLYGON, Geometry

# matplotlib.path.Path vertex codes (stable public constants)
MOVETO = 1
LINETO = 2
CLOSEPOLY = 79


def _ring_arrays(ring: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(ring, dtype=np.float64)[:, :2]
    codes = np.full(len(v), LINETO, dtype=np.uint8)
    if len(codes):
        codes[0] = MOVETO
    return v, codes


def polygon_path_arrays(polygon: Geometry) -> tuple[np.ndarray, np.ndarray]:
    """(Multi)Polygon -> (vertices (n,2), codes (n,)) of the compound
    path matplotlib would draw: every ring starts with MOVETO, polygons
    oriented exterior-CCW / holes-CW first (reference orients through
    shapely.ops.orient before building the Path)."""
    if polygon.type_id == MULTIPOLYGON:
        parts = [polygon_path_arrays(p) for p in polygon.parts or []]
        if not parts:
            return np.zeros((0, 2)), np.zeros(0, dtype=np.uint8)
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))
    oriented = orient_polygons(polygon)
    rings = [_ring_arrays(r) for r in (oriented.rings or [])]
    if not rings:
        return np.zeros((0, 2)), np.zeros(0, dtype=np.uint8)
    return (np.concatenate([r[0] for r in rings]),
            np.concatenate([r[1] for r in rings]))


def line_path_arrays(line: Geometry) -> tuple[np.ndarray, np.ndarray]:
    """(Multi)LineString/LinearRing -> compound-path (vertices, codes)."""
    if line.type_id == MULTILINESTRING:
        parts = [line_path_arrays(p) for p in line.parts or []]
        if not parts:
            return np.zeros((0, 2)), np.zeros(0, dtype=np.uint8)
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))
    return _ring_arrays(line.coords if line.coords is not None else np.zeros((0, 2)))


def _default_ax():
    import matplotlib.pyplot as plt

    ax = plt.gca()
    ax.grid(True)
    ax.set_aspect("equal")
    return ax


def _path_from_polygon(polygon: Geometry):
    from matplotlib.path import Path

    verts, codes = polygon_path_arrays(polygon)
    return Path(verts, codes)


def patch_from_polygon(polygon: Geometry, **kwargs):
    """Matplotlib PathPatch from a (Multi)Polygon
    (reference shapely/plotting.py:39)."""
    from matplotlib.patches import PathPatch

    return PathPatch(_path_from_polygon(polygon), **kwargs)


def plot_polygon(polygon: Geometry, ax=None, add_points: bool = True,
                 color=None, facecolor=None, edgecolor=None,
                 linewidth=None, **kwargs):
    """Plot a (Multi)Polygon (reference shapely/plotting.py:62): default
    color C0, fill at alpha 0.3; returns (PathPatch, Line2D) with
    add_points else PathPatch."""
    from matplotlib import colors

    if ax is None:
        ax = _default_ax()
    if color is None:
        color = "C0"
    color = colors.to_rgba(color)
    if facecolor is None:
        facecolor = (*color[:3], 0.3)
    if edgecolor is None:
        edgecolor = color
    patch = patch_from_polygon(
        polygon, facecolor=facecolor, edgecolor=edgecolor,
        linewidth=linewidth, **kwargs)
    ax.add_patch(patch)
    ax.autoscale_view()
    if add_points:
        line = plot_points(polygon, ax=ax, color=color)
        return patch, line
    return patch


def plot_line(line: Geometry, ax=None, add_points: bool = True,
              color=None, linewidth: float = 2, **kwargs):
    """Plot a (Multi)LineString/LinearRing
    (reference shapely/plotting.py:135)."""
    from matplotlib.patches import PathPatch
    from matplotlib.path import Path

    if ax is None:
        ax = _default_ax()
    if color is None:
        color = "C0"
    verts, codes = line_path_arrays(line)
    patch = PathPatch(Path(verts, codes), facecolor="none",
                      edgecolor=color, linewidth=linewidth, **kwargs)
    ax.add_patch(patch)
    ax.autoscale_view()
    if add_points:
        pts = plot_points(line, ax=ax, color=color)
        return patch, pts
    return patch


def plot_points(geom: Geometry, ax=None, color=None, marker: str = "o",
                **kwargs):
    """Plot a Point/MultiPoint or the vertices of any geometry
    (reference shapely/plotting.py:191)."""
    if ax is None:
        ax = _default_ax()
    coords = geom.all_coords()[:, :2] if not geom.is_empty else np.zeros((0, 2))
    (line,) = ax.plot(coords[:, 0], coords[:, 1], linestyle="",
                      marker=marker, color=color, **kwargs)
    return line
