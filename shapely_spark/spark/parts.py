"""Explode / collect operations — the DataFrame form of the reference's
inspection and indexed-creation surface (SURVEY.md §2.8).

Reference semantics:
- get_parts(return_index=True)   shapely/_geometry.py:646  → explode with
  repeat-index; here (id, part_index, wkb) rows
- get_rings(return_index=True)   shapely/_geometry.py:717
- get_coordinates(return_index)  shapely/coordinates.py:324 → (id,
  coord_index, x, y)
- points/multipoints(…, indices=) shapely/creation.py (indices= is a
  grouped collect; tested in shapely/tests/test_creation_indices.py) →
  groupBy(id) + assemble, the exact inverse of the explode

All fan-out runs in mapInPandas (Arrow batches, no per-row Python at the
plan level); collects run in groupBy().applyInPandas — Spark's native
explode/collect pair, which is why these ops cost one shuffle at most.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def get_parts_df(df: DataFrame, id_col: str, wkb_col: str = "wkb") -> DataFrame:
    """Explode multi-geometries into parts: (id, part_index, wkb)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, part_index int, wkb binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..geo.wkb import from_wkb, to_wkb

        for pdf in batches:
            ids, idxs, wkbs = [], [], []
            for i, b in zip(pdf[id_col], pdf[wkb_col]):
                g = from_wkb(bytes(b), on_invalid="ignore") if b is not None else None
                if g is None:
                    continue
                n = g.num_geometries()
                for j in range(n):
                    ids.append(i)
                    idxs.append(j)
                    wkbs.append(to_wkb(g.get_geometry(j)))
            yield pd.DataFrame(
                {id_col: ids, "part_index": pd.Series(idxs, dtype="int32"), "wkb": wkbs}
            )

    return df.select(id_col, wkb_col).mapInPandas(gen, schema)


def get_coordinates_df(df: DataFrame, id_col: str, wkb_col: str = "wkb") -> DataFrame:
    """Explode to coordinates: (id, coord_index, x, y)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, coord_index int, x double, y double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..geo.wkb import from_wkb

        for pdf in batches:
            out_id, out_i, out_x, out_y = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[wkb_col]):
                g = from_wkb(bytes(b), on_invalid="ignore") if b is not None else None
                if g is None:
                    continue
                c = g.all_coords()
                out_id.extend([i] * len(c))
                out_i.extend(range(len(c)))
                out_x.extend(c[:, 0].tolist())
                out_y.extend(c[:, 1].tolist())
            yield pd.DataFrame(
                {
                    id_col: out_id,
                    "coord_index": pd.Series(out_i, dtype="int32"),
                    "x": pd.Series(out_x, dtype="float64"),
                    "y": pd.Series(out_y, dtype="float64"),
                }
            )

    return df.select(id_col, wkb_col).mapInPandas(gen, schema)


def collect_multipoints(df: DataFrame, id_col: str, x_col: str = "x",
                        y_col: str = "y") -> DataFrame:
    """Grouped collect — (id, x, y) rows → (id, wkb multipoint, n_points).
    The inverse of get_coordinates_df for point data (reference:
    shapely/creation.py multipoints(…, indices=…)). Points are assembled in
    (x, y) sorted order so the result is deterministic under Spark's
    unordered shuffle."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, wkb binary, n_points int"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..geo.geom import MULTIPOINT, Geometry, point
        from ..geo.wkb import to_wkb

        xy = pdf[[x_col, y_col]].dropna().to_numpy(np.float64)
        order = np.lexsort((xy[:, 1], xy[:, 0]))
        xy = xy[order]
        g = Geometry(MULTIPOINT, parts=[point(x, y) for x, y in xy])
        return pd.DataFrame(
            {id_col: pdf[id_col].iloc[:1], "wkb": [to_wkb(g)], "n_points": [len(xy)]}
        )

    return df.select(id_col, x_col, y_col).groupBy(id_col).applyInPandas(fn, schema)
