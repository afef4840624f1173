"""H3/S2-style discrete global grid for partition-pruned spatial joins.

Engine-owned design (no reference analog — shapely has no index grid; this
replaces the STRtree envelope prune, shapely/strtree.py:30, at cluster
scale): a 2^r × 2^r rectangular grid over lon ∈ [-180,180), lat ∈ [-90,90),
row-major cell ids ``cell = iy * 2^r + ix``.

Why row-major and not Hilbert/Morton for the *id*: the id must be
reproducible as a plain SQL arithmetic expression (both Spark Catalyst and
the DuckDB oracle compute it bit-identically — see sql_cell_expr), and
equi-join pruning only needs equality. A Hilbert key IS provided
(hilbert_key) for data layout: sorting/range-partitioning the pages table by
Hilbert order co-locates spatially-near cells in the same parquet files so
min/max column stats prune scans at 100 TB.

All functions are vectorized NumPy; the Spark-side builders that produce the
equivalent Catalyst Column expressions live in shapely_spark/spark/columns.py.
"""

from __future__ import annotations

import numpy as np

DEFAULT_RES = 9  # 512×512 grid → cell ≈ 0.70° lon × 0.35° lat


def grid_n(res: int) -> int:
    return 1 << res


def cell_of(lat, lon, res: int = DEFAULT_RES):
    """(lat, lon) → cell id. NaN-safe: returns -1 for NaN coordinates.
    Mirrors sql_cell_expr() exactly — same arithmetic, same clamping."""
    n = grid_n(res)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    ix = np.floor((lon + 180.0) / 360.0 * n)
    iy = np.floor((lat + 90.0) / 180.0 * n)
    bad = np.isnan(lat) | np.isnan(lon)
    ix = np.clip(np.where(bad, 0.0, ix), 0, n - 1)
    iy = np.clip(np.where(bad, 0.0, iy), 0, n - 1)
    cell = (iy * n + ix).astype(np.int64)
    return np.where(bad, np.int64(-1), cell)


def sql_cell_expr(lat_col: str, lon_col: str, res: int = DEFAULT_RES) -> str:
    """The SAME cell computation as ANSI SQL, runnable by both Spark SQL and
    DuckDB — used by the driver's oracle comparison. Arithmetic kept
    identical (same op order) so IEEE-754 results match bit-exactly."""
    n = grid_n(res)
    ix = f"least({n - 1}, greatest(0, cast(floor(({lon_col} + 180.0) / 360.0 * {n}) as bigint)))"
    iy = f"least({n - 1}, greatest(0, cast(floor(({lat_col} + 90.0) / 180.0 * {n}) as bigint)))"
    return f"({iy} * {n} + {ix})"


def cell_xy(cell, res: int = DEFAULT_RES):
    n = grid_n(res)
    cell = np.asarray(cell, dtype=np.int64)
    return cell % n, cell // n


def cell_bounds(cell, res: int = DEFAULT_RES):
    """cell → (lon_min, lat_min, lon_max, lat_max), vectorized."""
    n = grid_n(res)
    ix, iy = cell_xy(cell, res)
    w, h = 360.0 / n, 180.0 / n
    return (-180.0 + ix * w, -90.0 + iy * h, -180.0 + (ix + 1) * w, -90.0 + (iy + 1) * h)


def cell_parent(cell, res: int = DEFAULT_RES, parent_res: int | None = None):
    """Containing cell at a coarser resolution (H3 cell_to_parent analog).
    Exact on the nested binary grid: ``(lon+180)/360 * 2^r`` differs from
    the parent-res value only by a power-of-two factor, which is exact in
    IEEE-754, so floor-then-shift equals floor-at-parent-res — verified
    against cell_of for clamped extremes in tests. -1 (NULL island)
    stays -1. Vectorized; pure bit arithmetic mirrored by
    spark/columns.cell_parent_col and the DuckDB oracle SQL."""
    if parent_res is None:
        parent_res = res - 1
    if not 0 <= parent_res <= res:
        raise ValueError(f"parent_res {parent_res} not in [0, {res}]")
    d = res - parent_res
    cell = np.asarray(cell, dtype=np.int64)
    ix, iy = cell & (grid_n(res) - 1), cell >> res
    parent = ((iy >> d) << parent_res) + (ix >> d)
    return np.where(cell < 0, np.int64(-1), parent)


def cell_children(cell: int, res: int = DEFAULT_RES, child_res: int | None = None) -> np.ndarray:
    """All 4^Δ children at a finer resolution (H3 cell_to_children analog);
    inverse of cell_parent (parent of every child is `cell`). The -1
    NULL-island sentinel has no children: it propagates as a single -1,
    mirroring cell_parent's sentinel handling."""
    if child_res is None:
        child_res = res + 1
    if child_res < res:
        raise ValueError(f"child_res {child_res} < res {res}")
    if int(cell) < 0:
        return np.array([-1], dtype=np.int64)
    s = 1 << (child_res - res)
    n = grid_n(res)
    ix, iy = int(cell % n), int(cell // n)
    xs = np.arange(ix * s, (ix + 1) * s, dtype=np.int64)
    ys = np.arange(iy * s, (iy + 1) * s, dtype=np.int64)
    return (ys[:, None] * (n * s) + xs[None, :]).ravel()


def disk(cell: int, k: int, res: int = DEFAULT_RES) -> np.ndarray:
    """All cells within Chebyshev distance k (the kNN candidate expansion
    neighborhood — analog of H3 kRing). Longitude wraps; latitude clamps."""
    n = grid_n(res)
    ix, iy = int(cell % n), int(cell // n)
    xs = (np.arange(ix - k, ix + k + 1)) % n
    ys = np.arange(max(0, iy - k), min(n - 1, iy + k) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return (gy.ravel() * n + gx.ravel()).astype(np.int64)


def ring(cell: int, k: int, res: int = DEFAULT_RES) -> np.ndarray:
    """Hollow ring at exactly Chebyshev distance k."""
    if k == 0:
        return np.array([cell], dtype=np.int64)
    inner = set(disk(cell, k - 1, res).tolist())
    return np.array([c for c in disk(cell, k, res).tolist() if c not in inner], dtype=np.int64)


def cover_bbox(xmin, ymin, xmax, ymax, res: int = DEFAULT_RES) -> np.ndarray:
    """All cells intersecting a lon/lat bbox (no wrap across antimeridian)."""
    n = grid_n(res)
    ix0 = int(np.clip(np.floor((xmin + 180.0) / 360.0 * n), 0, n - 1))
    ix1 = int(np.clip(np.floor((xmax + 180.0) / 360.0 * n), 0, n - 1))
    iy0 = int(np.clip(np.floor((ymin + 90.0) / 180.0 * n), 0, n - 1))
    iy1 = int(np.clip(np.floor((ymax + 90.0) / 180.0 * n), 0, n - 1))
    xs = np.arange(ix0, ix1 + 1)
    ys = np.arange(iy0, iy1 + 1)
    gx, gy = np.meshgrid(xs, ys)
    return (gy.ravel() * n + gx.ravel()).astype(np.int64)


def cover_bbox_batch(bounds: np.ndarray, res: int = DEFAULT_RES):
    """Vectorized cover_bbox over a (m, 4) bounds matrix: returns
    (cells, row_index) flat arrays — cells[k] belongs to input row
    row_index[k]. One pass of integer arithmetic for the whole batch;
    the per-geometry meshgrid loop was the cover stage's hot spot in the
    geometry×geometry join (≈50µs per geometry → ~0 amortized)."""
    n = grid_n(res)
    b = np.asarray(bounds, dtype=np.float64)
    if not len(b):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ix0 = np.clip(np.floor((b[:, 0] + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    ix1 = np.clip(np.floor((b[:, 2] + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy0 = np.clip(np.floor((b[:, 1] + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    iy1 = np.clip(np.floor((b[:, 3] + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    nx = ix1 - ix0 + 1
    counts = nx * (iy1 - iy0 + 1)
    total = int(counts.sum())
    row = np.repeat(np.arange(len(b), dtype=np.int64), counts)
    starts = np.zeros(len(b), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    t = np.arange(total, dtype=np.int64) - starts[row]
    nx_r = nx[row]
    cells = (iy0[row] + t // nx_r) * n + ix0[row] + t % nx_r
    return cells, row


def polygon_cover(geom, res: int = DEFAULT_RES):
    """Polygon → [(cell_id, full)] cover. ``full=True`` cells are entirely
    inside the polygon (join refine can be skipped — the broadcast-side
    analog of GEOS prepared containment short-circuit); ``full=False`` cells
    intersect the boundary and need the exact point-in-polygon refine.

    Cells whose rectangle doesn't intersect the polygon at all are dropped.
    """
    from ..geo import kernels as K
    from ..geo.constructive import clip_ring_by_rect
    from ..geo.geom import POLYGON, Geometry

    if geom is None or geom.is_empty:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=bool)
    bb = K.bounds(geom)
    cells = cover_bbox(bb[0], bb[1], bb[2], bb[3], res)
    rings_ = K._rings_of(geom)
    if not rings_:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=bool)
    segs = K._edges(geom)
    xmin, ymin, xmax, ymax = cell_bounds(cells, res)
    keep = np.zeros(len(cells), dtype=bool)
    full = np.zeros(len(cells), dtype=bool)
    # corner classification for all cells at once
    corners_x = np.stack([xmin, xmax, xmax, xmin], axis=1).ravel()
    corners_y = np.stack([ymin, ymin, ymax, ymax], axis=1).ravel()
    cls = K.points_in_rings_class(corners_x, corners_y, rings_).reshape(-1, 4)
    all_inside = (cls == K.INTERIOR).all(axis=1)
    any_closure = (cls >= K.BOUNDARY).any(axis=1)
    # does any polygon edge intersect the cell rect?
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    exmin, exmax = np.minimum(x1, x2), np.maximum(x1, x2)
    eymin, eymax = np.minimum(y1, y2), np.maximum(y1, y2)
    edge_bbox_hit = (
        (exmin[None, :] <= xmax[:, None])
        & (exmax[None, :] >= xmin[:, None])
        & (eymin[None, :] <= ymax[:, None])
        & (eymax[None, :] >= ymin[:, None])
    )
    edge_near = edge_bbox_hit.any(axis=1)
    full = all_inside & ~edge_near
    keep = full | any_closure | edge_near
    # cells not touched by corners/edges may still contain the whole
    # polygon (polygon smaller than one cell) — check polygon vertex cell
    vc = cell_of(geom.all_coords()[:1, 1], geom.all_coords()[:1, 0], res)
    keep |= np.isin(cells, vc)
    # refine edge_near cells: exact rect-vs-polygon intersection test
    amb = np.nonzero(edge_near & ~any_closure)[0]
    for i in amb:
        clipped = any(
            clip_ring_by_rect(r, xmin[i], ymin[i], xmax[i], ymax[i]) is not None for r in rings_
        )
        # also boundary-only pass-through (line clip) counts as intersecting
        if not clipped:
            g = Geometry(POLYGON, rings=rings_)
            inter = K.intersects(
                g,
                Geometry(
                    POLYGON,
                    rings=[
                        np.array(
                            [
                                [xmin[i], ymin[i]],
                                [xmax[i], ymin[i]],
                                [xmax[i], ymax[i]],
                                [xmin[i], ymax[i]],
                                [xmin[i], ymin[i]],
                            ]
                        )
                    ],
                ),
            )
            keep[i] = inter
        else:
            keep[i] = True
    return cells[keep], full[keep]


# ---------------------------------------------------------------------------
# Hilbert key — data-layout locality (sort key, NOT the join key)
# ---------------------------------------------------------------------------

def hilbert_key(lat, lon, order: int = 16):
    """Hilbert curve index of (lat, lon) at 2^order resolution, vectorized.
    Used to cluster the pages table on write (repartitionByRange + sortWithin)
    so parquet row-group min/max stats on cell_id prune at scale."""
    n = 1 << order
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x = np.where(flip, s - 1 - x_f, x_f)
        y = np.where(flip, s - 1 - y_f, y_f)
        x2, y2 = x.copy(), y.copy()
        x = np.where(swap, y2, x2)
        y = np.where(swap, x2, y2)
        s >>= 1
    return d
