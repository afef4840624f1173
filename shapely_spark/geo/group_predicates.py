"""Group-vectorized binary predicates: a batch of left geometries vs ONE
right geometry — the spatial_join_geom refine hot path for predicates
beyond ``intersects`` (r4 verdict item: the non-rect, non-intersects
remainder ran the scalar kernel per candidate pair).

Semantics are pinned to the scalar kernels (geo/kernels.py), which pin
the reference (shapely/predicates.py:556 contains, :729 covers, :905
overlaps, :968 touches, :500 crosses) — agreement is enforced by a fuzz
test (tests/test_group_predicates.py). The decomposition:

- **Batched direction 1** (left samples vs the one right container):
  every left's vertices stack into ONE ``_all_class`` pass; every left's
  edges stack and node against ∂R in ONE chunked ``_split_params`` sweep,
  fragment midpoints classify against R's rings in one pass (noding first
  is what makes each fragment sit in a single DE-9IM class — the
  "sampling needs noding" rule). Proper crossings are owner-tagged over
  the same stacked edges.
- **Batched gates**: bbox containment/overlap/equality prefilters decide
  most candidates with zero Python-per-pair work (containment joins:
  candidates whose bbox cannot contain R's bbox die here).
- **Per-left direction 2** (R samples vs each left) runs only for
  still-undecided lefts, and each is one vectorized NumPy pass (the same
  shape group_intersects' stage 2 uses) — never a per-pair scalar-kernel
  dispatch on the supported paths.

Supported batch shape: areal right (Polygon/MultiPolygon); lefts of any
point/line/polygon type. GeometryCollection lefts and non-areal rights
fall back to the scalar kernel (``group_predicate`` returns None for the
latter so the caller can dispatch).
"""

from __future__ import annotations

import numpy as np

from . import kernels as K
from .geom import GEOMETRYCOLLECTION, MULTIPOLYGON, POLYGON, Geometry
from .kernels import (
    BOUNDARY, EXTERIOR, INTERIOR, _EDGE_CHUNK, _all_class, _dim, _edges,
    _hole_rings, _holes_clear_of, _points_of, _ragged_stack, _rings_of,
    bounds, group_intersects, points_in_rings_class, points_on_segments,
)

_SUPPORTED = {
    "intersects", "within", "covered_by", "touches", "overlaps", "crosses",
    "contains", "covers", "contains_properly", "equals",
}


def _any_by(owner: np.ndarray, mask: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=bool)
    if len(mask) and mask.any():
        out[np.unique(owner[mask])] = True
    return out


def _vertex_facts(lgeoms, ids, rgeom):
    """(any_vext, any_vint, any_vbnd) per id: left vertices vs R."""
    m = len(ids)
    pts, owner = _ragged_stack([_points_of(lgeoms[i]) for i in ids], 2)
    cls = _all_class(pts, rgeom) if len(pts) else np.zeros(0, np.int8)
    return (_any_by(owner, cls == EXTERIOR, m),
            _any_by(owner, cls == INTERIOR, m),
            _any_by(owner, cls == BOUNDARY, m))


def _stacked_edges(lgeoms, ids, oriented: bool):
    from .overlay import _edges_of, _poly_rings_oriented

    parts = []
    for i in ids:
        g = lgeoms[i]
        if oriented and _dim(g) == 2:
            parts.append(_edges_of(_poly_rings_oriented(g)))
        else:
            parts.append(_edges(g))
    return _ragged_stack(parts, 4)


class _EdgeFacts:
    __slots__ = ("any_fext", "any_fint", "onb_frags", "onb_owner",
                 "cross", "tol")


def _edge_facts(lgeoms, ids, rgeom, eb, *, oriented=False,
                want_onb=False, want_cross=False) -> _EdgeFacts:
    """Noded-fragment facts per id, one chunked sweep over the stacked
    left edges: fragment-midpoint class vs R (EXTERIOR/INTERIOR witnesses
    exactly as kernels._noded_midpoint_class — on-∂R midpoints override to
    BOUNDARY), optional on-boundary fragments (for orientation-nudge
    interior witnesses) and owner-tagged proper crossings."""
    from .overlay import _overlay_tol, _split_params

    m = len(ids)
    f = _EdgeFacts()
    f.any_fext = np.zeros(m, dtype=bool)
    f.any_fint = np.zeros(m, dtype=bool)
    f.cross = np.zeros(m, dtype=bool)
    onb_fr, onb_ow = [], []
    se, owner = _stacked_edges(lgeoms, ids, oriented)
    f.tol = _overlay_tol(se, eb)
    if not len(se) or not len(eb):
        f.onb_frags = np.zeros((0, 4))
        f.onb_owner = np.zeros(0, np.int64)
        return f
    rr = _rings_of(rgeom)
    rows = max(1, _EDGE_CHUNK // len(eb))
    for s in range(0, len(se), rows):
        E, O = se[s:s + rows], owner[s:s + rows]
        if want_cross:
            ax1, ay1, ax2, ay2 = (E[:, i][:, None] for i in range(4))
            bx1, by1, bx2, by2 = (eb[:, i][None, :] for i in range(4))
            d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
            d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
            d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
            d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
            proper = (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
                      & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0))
            hit = proper.any(axis=1)
            if hit.any():
                f.cross[np.unique(O[hit])] = True
        params = _split_params(E, eb, f.tol)
        nsplit = np.fromiter((len(p) for p in params), np.int64, len(E))
        plain = nsplit == 0
        frs, ows = [E[plain]], [O[plain]]
        for k in np.flatnonzero(~plain):
            # endpoint params reuse exact vertices (overlay._fragments rule)
            x1, y1, x2, y2 = E[k]
            ts = np.concatenate(([0.0], params[k], [1.0]))
            xs = x1 + ts * (x2 - x1)
            ys = y1 + ts * (y2 - y1)
            xs[0], ys[0] = x1, y1
            xs[-1], ys[-1] = x2, y2
            frs.append(np.column_stack([xs[:-1], ys[:-1], xs[1:], ys[1:]]))
            ows.append(np.full(nsplit[k] + 1, O[k], dtype=np.int64))
        fr = np.concatenate(frs, axis=0)
        ow = np.concatenate(ows)
        keep = ((fr[:, 2] - fr[:, 0]) ** 2 + (fr[:, 3] - fr[:, 1]) ** 2) > 0
        fr, ow = fr[keep], ow[keep]
        if not len(fr):
            continue
        mx, my = (fr[:, 0] + fr[:, 2]) / 2.0, (fr[:, 1] + fr[:, 3]) / 2.0
        cls = points_in_rings_class(mx, my, rr)
        onb = points_on_segments(mx, my, eb, eps=f.tol)
        ext = (cls == EXTERIOR) & ~onb
        if ext.any():
            f.any_fext[np.unique(ow[ext])] = True
        itr = (cls == INTERIOR) & ~onb
        if itr.any():
            f.any_fint[np.unique(ow[itr])] = True
        if want_onb and onb.any():
            onb_fr.append(fr[onb])
            onb_ow.append(ow[onb])
    f.onb_frags = (np.concatenate(onb_fr, axis=0) if onb_fr
                   else np.zeros((0, 4)))
    f.onb_owner = (np.concatenate(onb_ow) if onb_ow
                   else np.zeros(0, np.int64))
    return f


def _nudge_interior(f: _EdgeFacts, rgeom) -> np.ndarray:
    """Per-owner: some on-∂R fragment of the (ORIENTED) left boundary has
    the left's interior side strictly inside R — the collinear-boundary
    int∩int witness of kernels._interiors_intersect (oriented rings carry
    interior on the LEFT; nudge well above noding tol)."""
    m = len(f.any_fext)
    fr, ow = f.onb_frags, f.onb_owner
    if not len(fr):
        return np.zeros(m, dtype=bool)
    dx, dy = fr[:, 2] - fr[:, 0], fr[:, 3] - fr[:, 1]
    ln = np.hypot(dx, dy)
    ok = ln > 0
    if not ok.any():
        return np.zeros(m, dtype=bool)
    delta = f.tol * 1e3
    mx = (fr[:, 0] + fr[:, 2]) / 2.0
    my = (fr[:, 1] + fr[:, 3]) / 2.0
    px = mx[ok] - dy[ok] / ln[ok] * delta
    py = my[ok] + dx[ok] / ln[ok] * delta
    cls = points_in_rings_class(px, py, _rings_of(rgeom))
    return _any_by(ow[ok], cls == INTERIOR, m)


def _ii_dir2(lg: Geometry, rgeom: Geometry, ebo: np.ndarray) -> bool:
    """Second-direction int∩int witnesses for areal left vs areal right:
    an R vertex strictly inside L, an R-boundary fragment (noded at ∂L)
    strictly inside L, or an on-∂L fragment whose R-interior side lies
    inside L. Mirrors the (∂B vs A) leg of kernels._interiors_intersect;
    one vectorized pass per left, run only for batch-undecided lefts."""
    from .overlay import (_edges_of, _fragments, _overlay_tol,
                          _poly_rings_oriented, _split_params)

    ra = _poly_rings_oriented(lg)
    rl = _rings_of(lg)
    rpts = _points_of(rgeom)
    if (points_in_rings_class(rpts[:, 0], rpts[:, 1], rl) == INTERIOR).any():
        return True
    eao = _edges_of(ra)
    if not len(eao) or not len(ebo):
        return False
    tol = _overlay_tol(eao, ebo)
    fr = _fragments(ebo, _split_params(ebo, eao, tol))
    if not len(fr):
        return False
    mx, my = (fr[:, 0] + fr[:, 2]) / 2.0, (fr[:, 1] + fr[:, 3]) / 2.0
    cls = points_in_rings_class(mx, my, ra)
    onb = points_on_segments(mx, my, eao, eps=tol)
    if ((cls == INTERIOR) & ~onb).any():
        return True
    idx = np.nonzero(onb)[0]
    if len(idx):
        dx, dy = fr[idx, 2] - fr[idx, 0], fr[idx, 3] - fr[idx, 1]
        ln = np.hypot(dx, dy)
        ok = ln > 0
        if ok.any():
            delta = tol * 1e3
            px = mx[idx][ok] - dy[ok] / ln[ok] * delta
            py = my[idx][ok] + dx[ok] / ln[ok] * delta
            if (points_in_rings_class(px, py, ra) == INTERIOR).any():
                return True
    return False


def group_predicate(predicate: str, lgeoms: list, rgeom) -> np.ndarray | None:
    """Evaluate ``predicate(lgeoms[i], rgeom)`` for a whole left batch.
    Returns a bool array, or None when the batch shape is unsupported
    (non-areal right, degenerate right, unknown predicate) — the caller
    falls back to the scalar kernel per pair."""
    n = len(lgeoms)
    if predicate == "intersects":
        return group_intersects(lgeoms, rgeom)
    if predicate not in _SUPPORTED:
        return None
    out = np.zeros(n, dtype=bool)
    if rgeom is None or rgeom.is_empty or n == 0:
        return out
    if rgeom.type_id not in (POLYGON, MULTIPOLYGON):
        return None
    eb = _edges(rgeom)
    if not len(eb):
        return None
    rb = bounds(rgeom)

    dims = np.full(n, -2, dtype=np.int64)
    LB = np.full((n, 4), np.nan)
    for i, g in enumerate(lgeoms):
        if g is None or g.is_empty:
            continue
        if g.type_id == GEOMETRYCOLLECTION:
            out[i] = bool(getattr(K, predicate)(g, rgeom))
            dims[i] = -3  # decided via scalar fallback
            continue
        dims[i] = _dim(g)
        LB[i] = bounds(g)

    # batched bbox gate — a necessary condition per predicate family
    valid = dims >= 0
    lb = np.where(valid[:, None], LB, 0.0)
    if predicate in ("within", "covered_by"):
        alive = valid & ((lb[:, 0] >= rb[0]) & (lb[:, 1] >= rb[1])
                         & (lb[:, 2] <= rb[2]) & (lb[:, 3] <= rb[3]))
    elif predicate in ("contains", "covers", "contains_properly"):
        alive = valid & ((lb[:, 0] <= rb[0]) & (lb[:, 1] <= rb[1])
                         & (lb[:, 2] >= rb[2]) & (lb[:, 3] >= rb[3]))
    elif predicate == "equals":
        alive = valid & ((lb[:, 0] == rb[0]) & (lb[:, 1] == rb[1])
                         & (lb[:, 2] == rb[2]) & (lb[:, 3] == rb[3]))
    else:  # touches / overlaps / crosses: intersection must be nonempty
        alive = valid & ~((lb[:, 0] > rb[2]) | (rb[0] > lb[:, 2])
                          | (lb[:, 1] > rb[3]) | (rb[1] > lb[:, 3]))
    if not alive.any():
        return out

    i0 = np.flatnonzero(alive & (dims == 0))
    i1 = np.flatnonzero(alive & (dims == 1))
    i2 = np.flatnonzero(alive & (dims == 2))

    if predicate in ("within", "covered_by"):
        # contains(R, L) / covers(R, L) — direction 1 only, fully batched
        # (kernels.contains:632 / covers:674 with a=R, b=L)
        holes_r = _hole_rings(rgeom)
        if len(i0):
            vext, vint, _vb = _vertex_facts(lgeoms, i0, rgeom)
            out[i0] = ~vext if predicate == "covered_by" else (~vext & vint)
        for ids in (i1, i2):
            if not len(ids):
                continue
            vext, vint, _vb = _vertex_facts(lgeoms, ids, rgeom)
            ef = _edge_facts(lgeoms, ids, rgeom, eb)
            res = ~vext & ~ef.any_fext
            if predicate == "within" and ids is i1:
                # line in areal R additionally needs an interior witness
                res &= vint | ef.any_fint
            if ids is i2 and holes_r:
                # a hole of R admitting L into R's exterior breaks it
                for k in np.flatnonzero(res):
                    if not _holes_clear_of(rgeom, lgeoms[ids[k]]):
                        res[k] = False
            out[ids] = res
        return out

    if predicate in ("contains", "covers", "contains_properly", "equals"):
        # direction-2 heavy: the batched bbox gate (above) kills every
        # candidate whose bbox cannot contain/equal R's; survivors are
        # ~the true pairs and each takes ONE internally-vectorized scalar
        # call (classify-all-R-samples + noded ∂R fragments vs that left)
        fn = getattr(K, predicate)
        for i in np.concatenate((i0, i1, i2)):
            out[i] = bool(fn(lgeoms[i], rgeom))
        return out

    if predicate == "crosses":
        # kernels.crosses:922 — vs areal R only dim<2 lefts can cross
        if len(i0):
            vext, vint, _vb = _vertex_facts(lgeoms, i0, rgeom)
            out[i0] = vint & vext
        if len(i1):
            ef = _edge_facts(lgeoms, i1, rgeom, eb)
            out[i1] = ef.any_fint & ef.any_fext
        return out

    if predicate == "touches":
        if len(i0):
            vext, vint, vbnd = _vertex_facts(lgeoms, i0, rgeom)
            out[i0] = vbnd & ~vint
        both = np.concatenate((i1, i2))
        if len(both):
            inter = group_intersects([lgeoms[i] for i in both], rgeom)
        if len(i1):
            vext, vint, _vb = _vertex_facts(lgeoms, i1, rgeom)
            ef = _edge_facts(lgeoms, i1, rgeom, eb)
            ii = vint | ef.any_fint
            out[i1] = inter[:len(i1)] & ~ii
        if len(i2):
            ii = _areal_ii(lgeoms, i2, rgeom, eb)
            out[i2] = inter[len(i1):] & ~ii
        return out

    if predicate == "overlaps":
        # kernels.overlaps:971 — same-dim only; R areal ⇒ dim-2 lefts
        if len(i2):
            ii = _areal_ii(lgeoms, i2, rgeom, eb)
            und = np.flatnonzero(ii)
            if len(und):
                # ¬covers(R,L): direction 1, batched over the candidates
                sub = i2[und]
                vext, _vi, _vb = _vertex_facts(lgeoms, sub, rgeom)
                ef = _edge_facts(lgeoms, sub, rgeom, eb)
                crl = ~vext & ~ef.any_fext  # covers(R, L) so far
                holes_r = _hole_rings(rgeom)
                for k in np.flatnonzero(crl):
                    if holes_r and not _holes_clear_of(rgeom, lgeoms[sub[k]]):
                        crl[k] = False
                res = ~crl
                # ¬covers(L,R): bbox gate first, survivors vectorized
                for k in np.flatnonzero(res):
                    b = LB[sub[k]]
                    if (b[0] <= rb[0] and b[1] <= rb[1]
                            and b[2] >= rb[2] and b[3] >= rb[3]
                            and K.covers(lgeoms[sub[k]], rgeom)):
                        res[k] = False
                out[sub] = res
        return out

    return None


def _areal_ii(lgeoms, ids, rgeom, eb) -> np.ndarray:
    """Batched int∩int for areal lefts vs areal R — the witness cascade of
    kernels._interiors_intersect:834: interior vertices / proper crossing /
    interior noded fragment / oriented-boundary nudge (all batched), then
    the (∂R vs L) leg per still-undecided left."""
    from .overlay import _edges_of, _poly_rings_oriented

    _ve, vint, _vb = _vertex_facts(lgeoms, ids, rgeom)
    ef = _edge_facts(lgeoms, ids, rgeom, eb, oriented=True,
                     want_onb=True, want_cross=True)
    ii = vint | ef.cross | ef.any_fint | _nudge_interior(ef, rgeom)
    und = np.flatnonzero(~ii)
    if len(und):
        ebo = _edges_of(_poly_rings_oriented(rgeom))
        for k in und:
            if _ii_dir2(lgeoms[ids[k]], rgeom, ebo):
                ii[k] = True
    return ii
