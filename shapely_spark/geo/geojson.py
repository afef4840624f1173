"""GeoJSON codec (RFC 7946) — pure Python/NumPy.

Reference semantics: shapely/io.py:206 to_geojson, :362 from_geojson
(GEOS ≥3.10 GeoJSON reader/writer). Feature / FeatureCollection inputs
decode to their geometry (a FeatureCollection becomes a
GeometryCollection), matching the reference reader.
"""

from __future__ import annotations

import json

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    empty,
)

_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
_TYPES = {v: k for k, v in _NAMES.items()}


def _coords_out(c: np.ndarray):
    return [list(map(float, row)) for row in np.asarray(c)]


def _geom_to_obj(g: Geometry) -> dict:
    tid = g.type_id
    if tid == POINT:
        if g.is_empty:
            return {"type": "Point", "coordinates": []}
        return {"type": "Point", "coordinates": list(map(float, g.coords[0]))}
    if tid == LINESTRING:
        return {"type": "LineString", "coordinates": _coords_out(g.coords if g.coords is not None else np.zeros((0, 2)))}
    if tid == POLYGON:
        return {"type": "Polygon", "coordinates": [_coords_out(r) for r in (g.rings or [])]}
    if tid == MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": [list(map(float, p.coords[0])) for p in (g.parts or [])]}
    if tid == MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [_coords_out(p.coords) for p in (g.parts or [])]}
    if tid == MULTIPOLYGON:
        return {"type": "MultiPolygon",
                "coordinates": [[_coords_out(r) for r in (p.rings or [])]
                                for p in (g.parts or [])]}
    if tid == GEOMETRYCOLLECTION:
        return {"type": "GeometryCollection",
                "geometries": [_geom_to_obj(p) for p in (g.parts or [])]}
    raise ValueError(f"cannot encode type {tid} as GeoJSON")


def to_geojson(geom: Geometry | None, indent: int | None = None) -> str | None:
    """reference: shapely/io.py:206. Geometry or 1-D array_like."""
    if isinstance(geom, (list, tuple, np.ndarray)):
        from .wkb import _broadcast
        return _broadcast(lambda g: to_geojson(g, indent), geom)
    if geom is None:
        return None
    return json.dumps(_geom_to_obj(geom), indent=indent)


def _obj_to_geom(obj: dict) -> Geometry:
    t = obj.get("type")
    if t == "Feature":
        geo = obj.get("geometry")
        return _obj_to_geom(geo) if geo else empty(GEOMETRYCOLLECTION)
    if t == "FeatureCollection":
        return Geometry(
            GEOMETRYCOLLECTION,
            parts=[_obj_to_geom(f) for f in obj.get("features", [])],
        )
    if t == "GeometryCollection":
        return Geometry(
            GEOMETRYCOLLECTION,
            parts=[_obj_to_geom(g) for g in obj.get("geometries", [])],
        )
    tid = _TYPES.get(t)
    if tid is None:
        raise ValueError(f"unsupported GeoJSON type: {t!r}")
    c = obj.get("coordinates", [])
    if tid == POINT:
        if not c:
            return empty(POINT)
        return Geometry(POINT, coords=np.array([c], dtype=np.float64))
    if tid == LINESTRING:
        return Geometry(LINESTRING, coords=np.array(c, dtype=np.float64).reshape(-1, len(c[0]) if c else 2))
    if tid == POLYGON:
        return Geometry(POLYGON, rings=[np.array(r, dtype=np.float64) for r in c])
    if tid == MULTIPOINT:
        return Geometry(
            MULTIPOINT,
            parts=[Geometry(POINT, coords=np.array([p], dtype=np.float64)) for p in c],
        )
    if tid == MULTILINESTRING:
        return Geometry(
            MULTILINESTRING,
            parts=[Geometry(LINESTRING, coords=np.array(l, dtype=np.float64)) for l in c],
        )
    if tid == MULTIPOLYGON:
        return Geometry(
            MULTIPOLYGON,
            parts=[
                Geometry(POLYGON, rings=[np.array(r, dtype=np.float64) for r in rings])
                for rings in c
            ],
        )
    raise ValueError(f"unsupported GeoJSON type: {t!r}")


def from_geojson(text: str | bytes | None, on_invalid: str = "raise") -> Geometry | None:
    """reference: shapely/io.py:362; on_invalid ∈ raise/warn/ignore.
    str/bytes or 1-D array_like."""
    if isinstance(text, (list, tuple, np.ndarray)):
        from .wkb import _broadcast
        return _broadcast(lambda t: from_geojson(t, on_invalid), text)
    if text is None:
        return None
    try:
        if isinstance(text, bytes):
            text = text.decode("utf-8")
        return _obj_to_geom(json.loads(text))
    except (ValueError, KeyError, TypeError, IndexError):
        if on_invalid == "raise":
            raise
        if on_invalid == "warn":
            import warnings

            warnings.warn("invalid GeoJSON ignored", stacklevel=2)
        return None
