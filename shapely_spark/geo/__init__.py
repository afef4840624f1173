from .geom import (  # noqa: F401
    GEOMETRYCOLLECTION, LINEARRING, LINESTRING, MISSING, MULTILINESTRING,
    MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, Geometry, box, empty,
    geometrycollection, linearring, linestring, multilinestring, multipoint,
    multipolygon, point, polygon, regular_ngon,
)
from .wkb import from_wkb, to_wkb, from_wkb_batch, to_wkb_batch  # noqa: F401
from .wkt import from_wkt, to_wkt  # noqa: F401
from . import kernels, constructive  # noqa: F401
from .strtree import STRtree  # noqa: F401
