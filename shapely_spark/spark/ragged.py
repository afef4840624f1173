"""Ragged (GeoArrow-style) columnar geometry layout ⇄ WKB.

Reference: shapely/_ragged_array.py:159 to_ragged_array / :417
from_ragged_array — "the Apache Arrow variable-size-list layout as
specified by GeoArrow" (_ragged_array.py:14-24). The Spark form keeps the
layout flat and SQL-typed so Catalyst/parquet handle it natively:

    geom_type  int        (homogeneous per call, single/multi promoted)
    coords     array<double>   interleaved x0,y0,x1,y1,…
    offsets    array<int>      ring offsets into coords/2 (polygons) or
                               part offsets (multi types); empty for points

This is the zero-Python-object interchange used when a pipeline wants
geometry columns parquet-scannable without WKB decode (e.g. pushdown on a
derived bbox next to them). Conversion runs per Arrow batch in NumPy.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RAGGED_SCHEMA = "geom_type int, coords array<double>, offsets array<int>"


def wkb_to_ragged(df: DataFrame, id_col: str, wkb_col: str = "wkb") -> DataFrame:
    """df(id, wkb) → (id, geom_type, coords, offsets). Mixed single/multi
    inputs are promoted to the multi type (reference:
    shapely/_ragged_array.py:309-318); unsupported mixes raise."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, {RAGGED_SCHEMA}"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..geo.geom import (
            LINESTRING,
            MULTILINESTRING,
            MULTIPOINT,
            MULTIPOLYGON,
            POINT,
            POLYGON,
        )
        from ..geo.wkb import from_wkb

        for pdf in batches:
            ids, types, coords_out, offsets_out = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[wkb_col]):
                g = from_wkb(bytes(b), on_invalid="ignore") if b is not None else None
                if g is None:
                    continue
                tid = g.type_id
                if tid in (POINT, LINESTRING):
                    c = g.coords[:, :2] if g.coords is not None else np.zeros((0, 2))
                    offs = []
                elif tid == POLYGON:
                    rings = g.rings or []
                    c = (np.concatenate([np.asarray(r)[:, :2] for r in rings])
                         if rings else np.zeros((0, 2)))
                    offs = np.cumsum([0] + [len(r) for r in rings]).tolist()
                elif tid in (MULTIPOINT, MULTILINESTRING):
                    parts = g.parts or []
                    c = (np.concatenate([p.coords[:, :2] for p in parts])
                         if parts else np.zeros((0, 2)))
                    offs = np.cumsum([0] + [len(p.coords) for p in parts]).tolist()
                elif tid == MULTIPOLYGON:
                    # two-level: ring offsets + per-part ring counts folded
                    # into one offsets array: [n_parts, ring_counts…, ring
                    # offsets…] (flat & SQL-typed; reconstructed exactly)
                    parts = g.parts or []
                    ring_lens, ring_counts, cs = [], [], []
                    for p in parts:
                        rs = p.rings or []
                        ring_counts.append(len(rs))
                        for r in rs:
                            ring_lens.append(len(r))
                            cs.append(np.asarray(r)[:, :2])
                    c = np.concatenate(cs) if cs else np.zeros((0, 2))
                    offs = ([len(parts)] + ring_counts
                            + np.cumsum([0] + ring_lens).tolist())
                else:
                    raise ValueError(f"ragged layout undefined for type {tid}")
                ids.append(i)
                types.append(tid)
                coords_out.append(c.ravel().tolist())
                offsets_out.append([int(o) for o in offs])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "geom_type": pd.Series(types, dtype="int32"),
                    "coords": coords_out,
                    "offsets": offsets_out,
                }
            )

    return df.select(id_col, wkb_col).mapInPandas(gen, schema)


def ragged_to_wkb(df: DataFrame, id_col: str) -> DataFrame:
    """(id, geom_type, coords, offsets) → (id, wkb): exact inverse of
    wkb_to_ragged (reference: shapely/_ragged_array.py:417)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, wkb binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..geo.geom import (
            LINESTRING,
            MULTILINESTRING,
            MULTIPOINT,
            MULTIPOLYGON,
            POINT,
            POLYGON,
            Geometry,
        )
        from ..geo.wkb import to_wkb

        for pdf in batches:
            ids, wkbs = [], []
            for i, tid, cs, offs in zip(
                pdf[id_col], pdf["geom_type"], pdf["coords"], pdf["offsets"]
            ):
                c = np.asarray(cs, dtype=np.float64).reshape(-1, 2)
                tid = int(tid)
                if tid in (POINT, LINESTRING):
                    g = Geometry(tid, coords=c)
                elif tid == POLYGON:
                    o = list(offs)
                    rings = [c[o[j]:o[j + 1]] for j in range(len(o) - 1)]
                    g = Geometry(POLYGON, rings=rings)
                elif tid in (MULTIPOINT, MULTILINESTRING):
                    o = list(offs)
                    sub = POINT if tid == MULTIPOINT else LINESTRING
                    g = Geometry(tid, parts=[
                        Geometry(sub, coords=c[o[j]:o[j + 1]])
                        for j in range(len(o) - 1)
                    ])
                elif tid == MULTIPOLYGON:
                    o = list(offs)
                    n_parts = o[0]
                    ring_counts = o[1:1 + n_parts]
                    ring_offs = o[1 + n_parts:]
                    parts, r_idx = [], 0
                    for pc in ring_counts:
                        rings = [
                            c[ring_offs[r_idx + j]:ring_offs[r_idx + j + 1]]
                            for j in range(pc)
                        ]
                        parts.append(Geometry(POLYGON, rings=rings))
                        r_idx += pc
                    g = Geometry(MULTIPOLYGON, parts=parts)
                else:
                    raise ValueError(f"ragged layout undefined for type {tid}")
                ids.append(i)
                wkbs.append(to_wkb(g))
            yield pd.DataFrame({id_col: ids, "wkb": wkbs})

    return df.select(id_col, "geom_type", "coords", "offsets").mapInPandas(gen, schema)
