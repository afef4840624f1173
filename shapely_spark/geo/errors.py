"""Engine error hierarchy — parity with the reference's
shapely/errors.py:1-80 so downstream ``except GEOSException:`` /
``except TopologicalError:`` code ports unchanged.

The reference's ``ShapelyError``/``GEOSException`` live in its C
extension (shapely.lib); here they are plain Python classes with the
same MRO relationships. ``GeometryTypeError`` keeps its historical
(TypeError, ValueError) bases (the reference's own class docstring notes
it replaced both) and additionally enters the ShapelyError hierarchy.
"""

from __future__ import annotations

import threading


class ShapelyError(Exception):
    """Base error class for this engine (reference shapely.lib.ShapelyError)."""


class GEOSException(ShapelyError):
    """Error raised by the geometry kernels (reference: errors surfaced
    from libgeos; here: from the NumPy kernel layer)."""


class UnsupportedGEOSVersionError(ShapelyError):
    """Raised when the GEOS library version does not support a certain
    operation (reference shapely/errors.py:35). The engine has no GEOS
    underneath, so nothing raises it — kept for except-clause parity."""


class DimensionError(ShapelyError):
    """An error in the number of coordinate dimensions."""


class TopologicalError(ShapelyError):
    """A geometry is invalid or topologically incorrect."""


class ShapelyDeprecationWarning(FutureWarning):
    """Warning for features that will be removed or changed in a future
    release."""


class EmptyPartError(ShapelyError):
    """An error signifying an empty part was encountered when creating a
    multi-part."""


class GeometryTypeError(ShapelyError, TypeError, ValueError):
    """An error raised when the geometry has an unrecognized or
    inappropriate type (reference shapely/errors.py:56; the TypeError/
    ValueError bases preserve this engine's historical except-clauses)."""


def setup_signal_checks(interval=10000):
    """Reference shapely/errors.py:8 — enables signal checks in the ufunc
    inner loops. This engine's kernels run in NumPy (which already honors
    KeyboardInterrupt between ops), so this only validates its argument."""
    if interval <= 0:
        raise ValueError("Signal checks interval must be greater than zero.")
    threading.main_thread()  # parity: resolvable main thread required


def __getattr__(name):
    import warnings

    # Alias Shapely 1.8 error classes to ShapelyError with deprecation
    # warning (reference shapely/errors.py:61-80)
    if name in {
        "ReadingError",
        "WKBReadingError",
        "WKTReadingError",
        "PredicateError",
        "InvalidGeometryError",
    }:
        warnings.warn(
            f"{name} is deprecated and will be removed in a future version. "
            f"Use ShapelyError instead (functions previously raising {name} "
            "will now raise a ShapelyError instead).",
            FutureWarning,
            stacklevel=2,
        )
        return ShapelyError

    raise AttributeError(f"module 'errors' has no attribute {name!r}")
