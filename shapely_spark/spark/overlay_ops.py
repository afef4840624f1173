"""DataFrame-level overlay operations: dissolve (union by key).

Reference semantics: shapely/set_operations.py:465 union_all with an
axis/indices grouping — the relational form is groupBy(key) + cascaded
union of the group's geometries (SURVEY.md §2.9 "dissolve/union by key").

Plan shape: groupBy(key).applyInPandas — one shuffle on the dissolve key;
each group unions locally with the tree-fold kernel (geo/overlay.union_all).
At scale, skewed keys (one giant group) are handled upstream by two-level
dissolve: pre-union within partitions (mapInPandas keyed by (key, salt)),
then final dissolve on the partial results — the same partial/final split
Catalyst applies to built-in aggregates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def dissolve(df: DataFrame, key_col: str, wkb_col: str = "wkb") -> DataFrame:
    """df(key, wkb, …) → (key, wkb, n_parts): union of each key's
    geometries. NULL/empty geometries are dropped (reference skips None,
    shapely/set_operations.py:500 union_all ignore-missing semantics)."""
    key_type = dict(df.dtypes)[key_col]
    schema = f"{key_col} {key_type}, wkb binary, n_parts int"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..geo.overlay import union_all
        from ..geo.wkb import from_wkb, to_wkb

        geoms = [from_wkb(bytes(b), on_invalid="ignore")
                 for b in pdf[wkb_col] if b is not None]
        geoms = [g for g in geoms if g is not None and not g.is_empty]
        u = union_all(geoms)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[:1],
                "wkb": [to_wkb(u)],
                "n_parts": [len(geoms)],
            }
        )

    return df.select(key_col, wkb_col).groupBy(key_col).applyInPandas(fn, schema)


def dissolve_two_level(df: DataFrame, key_col: str, wkb_col: str = "wkb",
                       salts: int = 8) -> DataFrame:
    """Skew-safe dissolve: partial union on (key, salt) first, final union
    on key — bounds any single task's group size by 1/salts."""
    from pyspark.sql import functions as F

    salted = df.select(key_col, wkb_col).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(wkb_col)), F.lit(salts))
    )
    key_type = dict(df.dtypes)[key_col]
    schema = f"{key_col} {key_type}, wkb binary, n_parts int"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..geo.overlay import union_all
        from ..geo.wkb import from_wkb, to_wkb

        geoms = [from_wkb(bytes(b), on_invalid="ignore")
                 for b in pdf[wkb_col] if b is not None]
        geoms = [g for g in geoms if g is not None and not g.is_empty]
        u = union_all(geoms)
        return pd.DataFrame(
            {key_col: pdf[key_col].iloc[:1], "wkb": [to_wkb(u)], "n_parts": [len(geoms)]}
        )

    partial = salted.groupBy(key_col, "__salt").applyInPandas(
        lambda pdf: fn(pdf).assign(__salt=pdf["__salt"].iloc[0]),
        f"{key_col} {key_type}, wkb binary, n_parts int, __salt bigint",
    )
    return partial.groupBy(key_col).applyInPandas(fn, schema)


def coverage_simplify_grouped(
    df: DataFrame, key_col: str, id_col: str, wkb_col: str = "wkb",
    tolerance: float = 0.0, simplify_boundary: bool = True,
) -> DataFrame:
    """Per-group topology-preserving coverage simplification: each key's
    polygons form one coverage (e.g. admin level, tile sheet); shared
    chains are simplified ONCE per group so neighbors inside a group stay
    exactly edge-matched (geo/coverage.py semantics, reference:
    shapely/_coverage.py:101). Groups are independent → the groupBy
    shuffle is the natural parallel unit; a group must fit one task
    (coverage sheets are bounded by construction — a planet-wide coverage
    should be keyed by tile)."""
    key_type = dict(df.dtypes)[key_col]
    id_type = dict(df.dtypes)[id_col]
    schema = f"{key_col} {key_type}, {id_col} {id_type}, wkb binary"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..geo.coverage import coverage_simplify
        from ..geo.wkb import from_wkb, to_wkb

        geoms = [None if b is None else from_wkb(bytes(b), on_invalid="ignore")
                 for b in pdf[wkb_col]]
        simp = coverage_simplify(geoms, tolerance, simplify_boundary=simplify_boundary)
        return pd.DataFrame({
            key_col: pdf[key_col],
            id_col: pdf[id_col],
            "wkb": [None if g is None else to_wkb(g) for g in simp],
        })

    return df.select(key_col, id_col, wkb_col).groupBy(key_col).applyInPandas(fn, schema)
