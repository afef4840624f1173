from .geom import (  # noqa: F401
    GEOMETRYCOLLECTION, LINEARRING, LINESTRING, MISSING, MULTILINESTRING,
    MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, Geometry, box, empty,
    geometrycollection, get_m, get_x, get_y, get_z, linearring, linestring,
    multilinestring, multipoint, multipolygon, point, polygon, regular_ngon,
)
from .coverage import (  # noqa: F401
    coverage_invalid_edges, coverage_is_valid, coverage_simplify,
)
from .wkb import from_wkb, to_wkb, from_wkb_batch, to_wkb_batch  # noqa: F401
from .wkt import from_wkt, to_wkt  # noqa: F401
from .geojson import from_geojson, to_geojson  # noqa: F401
from . import kernels, constructive, overlay, triangulate  # noqa: F401
from .overlay import (  # noqa: F401
    build_area, concave_hull, difference, intersection, make_valid, node,
    polygonize, shared_paths, split, symmetric_difference, union, union_all,
)
from .triangulate import (  # noqa: F401
    delaunay_triangles, maximum_inscribed_circle, polylabel, voronoi_diagram,
    voronoi_polygons,
)
from .strtree import STRtree  # noqa: F401
from .constructive import (  # noqa: F401
    BufferCapStyle, BufferJoinStyle, coverage_union, disjoint_subset_union,
    disjoint_subset_union_all, offset_curve,
)
from .kernels import (  # noqa: F401
    destroy_prepared, explain_validity, is_prepared, prepare, validate,
)
from .geom import (  # noqa: F401
    is_geometry, is_missing, is_valid_input, linearrings,
)
from .constructive import (  # noqa: F401
    boundary, minimum_rotated_rectangle, transform_coordseq,
)
from .testing import assert_geometries_equal  # noqa: F401
from . import plotting, speedups  # noqa: F401
from . import creation, inspection, ops, prepared, ragged, wkb, wkt  # noqa: F401
from .prepared import PreparedGeometry, prep  # noqa: F401
from .ragged import from_ragged_array, to_ragged_array  # noqa: F401
from .creation import (  # noqa: F401
    geometrycollections, linestrings, multilinestrings, multipoints,
    multipolygons, points, polygons,
)
from .inspection import (  # noqa: F401
    GeometryType, count_coordinates, equals_exact, equals_identical,
    get_coordinate_dimension, get_coordinates, get_dimensions,
    get_exterior_ring, get_geometry, get_interior_ring,
    get_num_coordinates, get_num_geometries, get_num_interior_rings,
    get_num_points, get_parts, get_point, get_precision, get_rings,
    get_srid, get_type_id, has_m, has_z, is_empty, set_srid, transform,
)
from .ops import linemerge, orient, unary_union  # noqa: F401
# OO class veneer LAST: it binds methods onto Geometry and delegates to
# every module above (reference shapely/geometry package).
from .geometry import (  # noqa: F401
    CAP_STYLE, GeometryCollection, GeometryTypeError, JOIN_STYLE,
    LinearRing, LineString, MultiLineString, MultiPoint, MultiPolygon,
    Point, Polygon, mapping, shape,
)
from . import geometry  # noqa: F401
from . import vectorized  # noqa: F401,E402
from .errors import (  # noqa: F401
    DimensionError, EmptyPartError, GEOSException, ShapelyError,
    TopologicalError, UnsupportedGEOSVersionError, setup_signal_checks,
)
from . import errors  # noqa: F401
from .coords import CoordinateSequence  # noqa: F401
from . import coords  # noqa: F401

# GEOS version surface (reference shapely/__init__.py: geos_version et
# al. from shapely.lib). No libgeos runs here — these report the GEOS
# whose semantics the kernels pin (the reference fixtures this repo
# gates against), marked as emulated in the strings. Downstream
# capability checks (`geos_version >= (3, 12, 0)`) work unchanged.
geos_version = (3, 13, 0)
geos_capi_version = (1, 19, 2)
geos_version_string = "3.13.0 (shapely_spark emulation)"
geos_capi_version_string = "3.13.0-CAPI-1.19.2 (shapely_spark emulation)"


def __getattr__(name):
    """Resolve any remaining reference top-level symbol against the
    kernel modules, in a fixed precedence order — the reference's flat
    `shapely.*` namespace re-exports every ufunc (measurement,
    predicates, set ops, constructive, linear); this keeps ported code
    like `shapely.area(...)` / `shapely.intersects(...)` working without
    enumerating hundreds of explicit re-exports."""
    for m in (kernels, constructive, overlay, triangulate, inspection,
              creation, ops):
        if hasattr(m, name):
            return getattr(m, name)
    raise AttributeError(
        f"module 'shapely_spark.geo' has no attribute {name!r}")
