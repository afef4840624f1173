"""ST_* column/SQL function surface over WKB geometry columns.

The user-facing function layer: every reference operation that makes sense
as a per-row column function is exposed as an Arrow-batched pandas UDF over
BinaryType WKB (the engine's canonical geometry encoding, SURVEY.md §1.4),
and `register_sql_functions(spark)` installs them in the session's
FunctionRegistry so plain Spark SQL works:

    SELECT st_area(st_buffer(st_point(lon, lat), 0.1)) FROM pages

Each UDF decodes WKB per batch with the NumPy codec and runs the kernel —
no GEOS, no per-row Python. Cited reference semantics per function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..geo import constructive as C
from ..geo import kernels as K
from ..geo.geom import point as make_point
from ..geo.wkb import from_wkb, to_wkb
from ..geo.wkt import from_wkt, to_wkt


_CACHE: dict | None = None


def _build() -> dict:
    """UDF construction is deferred — pyspark 4 requires an active
    SparkSession to create pandas UDFs, so import must stay session-free."""
    def _geoms(col: pd.Series):
        return [None if b is None else from_wkb(bytes(b), on_invalid="ignore") for b in col]


    # ---- constructors ----------------------------------------------------------

    @F.pandas_udf("binary")
    def st_point(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series([
            None if (a is None or b is None) else to_wkb(make_point(a, b))
            for a, b in zip(x, y)
        ])


    @F.pandas_udf("binary")
    def st_geomfromtext(wkt: pd.Series) -> pd.Series:
        """reference: shapely/io.py:269 from_wkt."""
        return pd.Series([None if t is None else to_wkb(from_wkt(t, on_invalid="ignore")) for t in wkt])


    @F.pandas_udf("string")
    def st_astext(wkb: pd.Series) -> pd.Series:
        """reference: shapely/io.py:33 to_wkt."""
        return pd.Series([None if g is None else to_wkt(g) for g in _geoms(wkb)])


    # ---- measurement (reference: shapely/measurement.py) ------------------------

    @F.pandas_udf("double")
    def st_area(wkb: pd.Series) -> pd.Series:
        return pd.Series([K.area(g) for g in _geoms(wkb)], dtype="float64")


    @F.pandas_udf("double")
    def st_length(wkb: pd.Series) -> pd.Series:
        return pd.Series([K.length(g) for g in _geoms(wkb)], dtype="float64")


    @F.pandas_udf("array<double>")
    def st_bounds(wkb: pd.Series) -> pd.Series:
        return pd.Series([K.bounds(g).tolist() for g in _geoms(wkb)])


    @F.pandas_udf("double")
    def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [K.distance(g, h) for g, h in zip(_geoms(a), _geoms(b))], dtype="float64"
        )


    # ---- predicates (reference: shapely/predicates.py) ---------------------------

    def _binary_pred(fn):
        @F.pandas_udf("boolean")
        def pred(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series([fn(g, h) for g, h in zip(_geoms(a), _geoms(b))], dtype="bool")

        return pred


    st_intersects = _binary_pred(K.intersects)
    st_contains = _binary_pred(K.contains)
    st_within = _binary_pred(K.within)
    st_covers = _binary_pred(K.covers)
    st_touches = _binary_pred(K.touches)
    st_crosses = _binary_pred(K.crosses)
    st_overlaps = _binary_pred(K.overlaps)
    st_equals = _binary_pred(K.equals)
    st_disjoint = _binary_pred(K.disjoint)


    @F.pandas_udf("boolean")
    def st_contains_xy(wkb: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        """reference: shapely/predicates.py:1311 — prepared point fast path,
        vectorized over the batch grouped by distinct polygon."""
        out = np.zeros(len(wkb), dtype=bool)
        xs = x.to_numpy(np.float64)
        ys = y.to_numpy(np.float64)
        codes, uniques = pd.factorize(wkb)
        for u_idx, u in enumerate(uniques):
            if u is None:
                continue
            sel = codes == u_idx
            g = from_wkb(bytes(u), on_invalid="ignore")
            if g is None:
                continue
            prep = K.PreparedPolygons([g])
            out[sel] = prep.classify(0, xs[sel], ys[sel]) == K.INTERIOR
        return pd.Series(out)


    @F.pandas_udf("boolean")
    def st_is_valid(wkb: pd.Series) -> pd.Series:
        return pd.Series([g is not None and K.is_valid(g) for g in _geoms(wkb)], dtype="bool")


    @F.pandas_udf("boolean")
    def st_is_empty(wkb: pd.Series) -> pd.Series:
        return pd.Series([g is None or g.is_empty for g in _geoms(wkb)], dtype="bool")


    # ---- constructive (reference: shapely/constructive.py) -----------------------

    def _unary_geom(fn):
        @F.pandas_udf("binary")
        def udf(wkb: pd.Series) -> pd.Series:
            out = []
            for g in _geoms(wkb):
                try:
                    r = fn(g)
                except NotImplementedError:
                    r = None
                out.append(None if r is None else to_wkb(r))
            return pd.Series(out)

        return udf


    st_centroid = _unary_geom(C.centroid)
    st_convexhull = _unary_geom(C.convex_hull)
    st_envelope = _unary_geom(C.envelope)
    st_orientedenvelope = _unary_geom(C.oriented_envelope)
    st_minimumboundingcircle = _unary_geom(C.minimum_bounding_circle)


    @F.pandas_udf("binary")
    def st_buffer(wkb: pd.Series, dist: pd.Series, quad_segs: pd.Series) -> pd.Series:
        out = []
        for g, d, qs in zip(_geoms(wkb), dist, quad_segs):
            try:
                out.append(None if g is None else to_wkb(C.buffer(g, float(d), int(qs))))
            except NotImplementedError:
                out.append(None)
        return pd.Series(out)


    @F.pandas_udf("binary")
    def st_simplify(wkb: pd.Series, tol: pd.Series) -> pd.Series:
        return pd.Series(
            [None if g is None else to_wkb(C.simplify(g, float(t)))
             for g, t in zip(_geoms(wkb), tol)]
        )


    @F.pandas_udf("binary")
    def st_clip_by_rect(wkb: pd.Series, xmin: pd.Series, ymin: pd.Series,
                        xmax: pd.Series, ymax: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if g is None
                else to_wkb(C.clip_by_rect(g, float(a), float(b), float(c2), float(d)))
                for g, a, b, c2, d in zip(_geoms(wkb), xmin, ymin, xmax, ymax)
            ]
        )


    @F.pandas_udf("int")
    def st_npoints(wkb: pd.Series) -> pd.Series:
        """reference: shapely/_geometry.py:173 get_num_coordinates."""
        return pd.Series(
            [0 if g is None else g.num_coordinates() for g in _geoms(wkb)], dtype="int32"
        )


    @F.pandas_udf("string")
    def st_geometrytype(wkb: pd.Series) -> pd.Series:
        from ..geo.geom import TYPE_NAMES

        return pd.Series([None if g is None else TYPE_NAMES[g.type_id] for g in _geoms(wkb)])


    ALL_FUNCTIONS = {
        "st_point": st_point,
        "st_geomfromtext": st_geomfromtext,
        "st_astext": st_astext,
        "st_area": st_area,
        "st_length": st_length,
        "st_bounds": st_bounds,
        "st_distance": st_distance,
        "st_intersects": st_intersects,
        "st_contains": st_contains,
        "st_within": st_within,
        "st_covers": st_covers,
        "st_touches": st_touches,
        "st_crosses": st_crosses,
        "st_overlaps": st_overlaps,
        "st_equals": st_equals,
        "st_disjoint": st_disjoint,
        "st_contains_xy": st_contains_xy,
        "st_is_valid": st_is_valid,
        "st_is_empty": st_is_empty,
        "st_centroid": st_centroid,
        "st_convexhull": st_convexhull,
        "st_envelope": st_envelope,
        "st_orientedenvelope": st_orientedenvelope,
        "st_minimumboundingcircle": st_minimumboundingcircle,
        "st_buffer": st_buffer,
        "st_simplify": st_simplify,
        "st_clip_by_rect": st_clip_by_rect,
        "st_npoints": st_npoints,
        "st_geometrytype": st_geometrytype,
    }


    return ALL_FUNCTIONS


def get_functions() -> dict:
    global _CACHE
    if _CACHE is None:
        _CACHE = _build()
    return _CACHE


def __getattr__(name):
    if name.startswith("__"):  # import machinery probes (__path__ etc.)
        raise AttributeError(name)
    fns = get_functions()
    if name in fns:
        return fns[name]
    raise AttributeError(name)


def register_sql_functions(spark):
    """Install every ST_ function into the session FunctionRegistry so they
    are callable from spark.sql(...). Returns the registered names."""
    fns = get_functions()
    for name, udf in fns.items():
        spark.udf.register(name, udf)
    return sorted(fns)
