"""shapely.ops-compatible surface (reference: shapely/ops.py __all__:24).

The reference's ops module is a thin veneer over the core kernels
(ops.py:126-130 binds polygonize/linemerge/unary_union through a
CollectionOperator singleton named ``operator``); this module reproduces
the veneer over this engine's kernels so reference code importing from
``shapely.ops`` ports by name.
"""

from __future__ import annotations

from .constructive import (  # noqa: F401
    clip_by_rect,
    nearest_points,
    snap,
    substring,
)
from .geom import MULTILINESTRING, Geometry, multilinestring
from .kernels import validate  # noqa: F401
from .overlay import (  # noqa: F401
    polygonize,
    polygonize_full,
    shared_paths,
    split,
    union_all as unary_union,
)
from .triangulate import voronoi_diagram  # noqa: F401

__all__ = [
    "clip_by_rect", "linemerge", "nearest_points", "operator", "orient",
    "polygonize", "polygonize_full", "shared_paths", "snap", "split",
    "substring", "transform", "triangulate", "unary_union", "validate",
    "voronoi_diagram",
]


def orient(geom: Geometry | None, sign: float = 1.0) -> Geometry | None:
    """reference: shapely/ops.py:664 — sign >= 0: exterior CCW (holes CW);
    sign < 0: exterior CW. Delegates to orient_polygons like the
    reference delegates to shapely.orient_polygons."""
    from .constructive import orient_polygons

    return orient_polygons(geom, exterior_cw=sign < 0)


def linemerge(lines, directed: bool = False) -> Geometry | None:
    """reference: shapely/ops.py linemerge — accepts a MultiLineString,
    a GeometryCollection of lines, or a sequence of lines/coord pairs,
    then delegates to the line_merge kernel (constructive.py)."""
    from .constructive import line_merge
    from .geom import LINESTRING, GEOMETRYCOLLECTION

    if isinstance(lines, Geometry):
        if lines.type_id == GEOMETRYCOLLECTION:
            lines = multilinestring([p for p in (lines.parts or [])
                                     if p.type_id == LINESTRING])
        elif lines.type_id != MULTILINESTRING:
            lines = multilinestring([lines])
    else:
        lines = multilinestring(list(lines))
    return line_merge(lines, directed=directed)


def transform(func, geom: Geometry | None) -> Geometry | None:
    """reference: shapely/ops.py:216 — func(xs, ys[, zs]) -> column
    tuples, applied per coordinate sequence (the ops-style transform;
    the coordinates.py-style one is inspection.transform)."""
    from .constructive import transform_coords
    import numpy as np

    if geom is None:
        return None

    def fn(xy):
        out = func(*(xy[:, i] for i in range(xy.shape[1])))
        return np.column_stack([np.asarray(c, dtype=np.float64) for c in out])

    return transform_coords(geom, fn)


def triangulate(geom: Geometry | None, tolerance: float = 0.0,
                edges: bool = False) -> list:
    """reference: shapely/ops.py:133 — Delaunay triangles as a LIST of
    polygons (or edge linestrings with edges=True)."""
    from .triangulate import delaunay_triangles

    out = delaunay_triangles(geom, tolerance=tolerance, only_edges=edges)
    if out is None:
        return []
    return list(out.parts or [])


class CollectionOperator:
    """reference: shapely/ops.py:40 — the veneer object; ops.py:126 binds
    the module functions through a singleton of it."""

    polygonize = staticmethod(polygonize)
    polygonize_full = staticmethod(polygonize_full)
    unary_union = staticmethod(unary_union)

    @staticmethod
    def linemerge(lines, directed: bool = False):
        return linemerge(lines, directed=directed)


operator = CollectionOperator()
