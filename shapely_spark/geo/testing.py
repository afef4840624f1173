"""Testing helpers (reference: shapely/testing.py).

assert_geometries_equal mirrors the reference semantics: geometries (or
object arrays of them) compare by type and exact coordinate sequence,
with optional `tolerance` (per-ordinate), `normalize` (canonical form
first), and NaN == NaN by default (equal_nan)."""

from __future__ import annotations

import numpy as np

from .geom import Geometry


def _coords_equal(a: np.ndarray, b: np.ndarray, tol: float, equal_nan: bool) -> bool:
    if a is None or b is None:
        return a is b
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        return False
    close = np.isclose(a, b, rtol=0.0, atol=tol, equal_nan=equal_nan)
    return bool(close.all())


def _geom_equal(x, y, tol: float, normalize: bool, equal_nan: bool) -> bool:
    if x is None or y is None:
        return x is y
    if normalize:
        from .constructive import normalize as _norm

        x, y = _norm(x), _norm(y)
    if x.type_id != y.type_id:
        return False
    if x.is_empty and y.is_empty:
        return True
    for attr in ("coords",):
        if not _coords_equal(getattr(x, attr, None), getattr(y, attr, None), tol, equal_nan):
            return False
    xr, yr = x.rings or [], y.rings or []
    if len(xr) != len(yr) or any(
        not _coords_equal(a, b, tol, equal_nan) for a, b in zip(xr, yr)
    ):
        return False
    xp, yp = x.parts or [], y.parts or []
    if len(xp) != len(yp):
        return False
    return all(_geom_equal(a, b, tol, False, equal_nan) for a, b in zip(xp, yp))


def assert_geometries_equal(x, y, tolerance: float = 1e-7, *,
                            normalize: bool = False, equal_nan: bool = True):
    """reference: shapely/testing.py:60 assert_geometries_equal."""
    xs = x if isinstance(x, (list, tuple, np.ndarray)) else [x]
    ys = y if isinstance(y, (list, tuple, np.ndarray)) else [y]
    if len(xs) != len(ys):
        raise AssertionError(f"length mismatch: {len(xs)} != {len(ys)}")
    for i, (a, b) in enumerate(zip(xs, ys)):
        if isinstance(a, Geometry) or isinstance(b, Geometry) or a is None or b is None:
            if not _geom_equal(a, b, tolerance, normalize, equal_nan):
                raise AssertionError(f"geometries differ at index {i}: {a!r} != {b!r}")
        elif a != b:
            raise AssertionError(f"values differ at index {i}: {a!r} != {b!r}")
