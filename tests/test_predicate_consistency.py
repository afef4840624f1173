"""Property-based cross-checks between the named predicate kernels and the
DE-9IM relate matrix (reference semantics: shapely/predicates.py — each
named predicate must agree with its DE-9IM pattern, relate(a,b) must be
the transpose of relate(b,a), and the standard implication lattice
contains ⇒ covers ⇒ intersects must hold).

The named predicates (kernels.intersects/contains/touches/...) and the
general relate matrix (kernels._relate_matrix) are INDEPENDENT code
paths, so agreement between them over a fuzzed geometry zoo is a strong
internal-consistency oracle that needs no external engine. Coordinates
snap to a half-unit grid on purpose: shared edges, corner contacts and
collinear overlaps are where predicate semantics diverge."""

import numpy as np
from hypothesis import given, settings, strategies as st

from shapely_spark.geo import kernels as K
from shapely_spark.geo.geom import (
    box,
    linestring,
    multilinestring,
    multipoint,
    multipolygon,
    point,
    polygon,
    regular_ngon,
)

coord = st.integers(min_value=-6, max_value=6).map(lambda v: v * 0.5)


@st.composite
def geoms(draw):
    kind = draw(st.sampled_from(
        ["point", "segment", "polyline", "box", "holed_box", "ngon", "multipoint",
         "multiline", "multipolygon"]
    ))
    x, y = draw(coord), draw(coord)
    if kind == "point":
        return point(x, y)
    if kind == "segment":
        x2, y2 = draw(coord), draw(coord)
        if (x2, y2) == (x, y):
            x2 += 0.5
        return linestring([(x, y), (x2, y2)])
    if kind == "polyline":
        pts = [(x, y)]
        for _ in range(draw(st.integers(2, 3))):
            pts.append((draw(coord), draw(coord)))
        pts = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
        if len(pts) < 2:
            pts.append((x + 0.5, y))
        return linestring(pts)
    if kind == "multipoint":
        n = draw(st.integers(1, 3))
        return multipoint([(draw(coord), draw(coord)) for _ in range(n)])
    if kind == "multiline":
        parts = []
        for _ in range(draw(st.integers(2, 3))):
            px, py = draw(coord), draw(coord)
            qx, qy = draw(coord), draw(coord)
            if (qx, qy) == (px, py):
                qx += 0.5
            parts.append(linestring([(px, py), (qx, qy)]))
        return multilinestring(parts)
    if kind == "multipolygon":
        # disjoint parts (reference relate requires valid multipolygons):
        # two boxes separated by a large fixed offset
        w = draw(st.integers(1, 3)) * 0.5
        return multipolygon([
            box(x, y, x + w, y + w),
            box(x + w + 0.5, y, x + 2 * w + 0.5, y + w),
        ])
    w = draw(st.integers(1, 5)) * 0.5
    h = draw(st.integers(1, 5)) * 0.5
    if kind == "box":
        return box(x, y, x + w, y + h)
    if kind == "holed_box":
        outer = box(x, y, x + max(w, 1.5), y + max(h, 1.5))
        sh = outer.rings[0]
        c = sh[:-1].mean(axis=0)
        hole = (sh - c) * 0.4 + c
        return polygon(sh, [hole[::-1]])
    g = regular_ngon(x, y, w, draw(st.integers(3, 7)))
    # snap the cos/sin noise (±1e-16): an ngon vertex landing 1e-16 from a
    # grid point sits inside relate's noding tolerance but outside the exact
    # named-predicate comparisons — a designed tolerance-model difference,
    # not an inconsistency; the zoo must offer exactly-representable touches
    return polygon(np.round(g.rings[0], 9))


def _matches(matrix: str, pattern: str) -> bool:
    for m, p in zip(matrix, pattern):
        if p == "*":
            continue
        if p == "T":
            if m in ("F", "-"):  # any intersection of any dimension
                return False
        elif m != p:
            return False
    return True


@settings(max_examples=250, deadline=None)
@given(geoms(), geoms())
def test_relate_transpose_and_named_predicates(a, b):
    m_ab = K.relate(a, b)
    m_ba = K.relate(b, a)
    # transpose: swap (i,j) → (j,i) of the 3×3 matrix
    assert m_ba == "".join(m_ab[3 * (i % 3) + i // 3] for i in range(9))

    assert K.intersects(a, b) == (not _matches(m_ab, "FF*FF****"))
    assert K.within(a, b) == _matches(m_ab, "T*F**F***")
    assert K.contains(a, b) == _matches(m_ba, "T*F**F***")
    assert K.touches(a, b) == (
        _matches(m_ab, "FT*******")
        or _matches(m_ab, "F**T*****")
        or _matches(m_ab, "F***T****")
    )
    assert K.crosses(a, b) == (
        _matches(m_ab, "T*T******") if K._dim(a) < K._dim(b)
        else _matches(m_ab, "T*****T**") if K._dim(a) > K._dim(b)
        else (K._dim(a) == 1 and _matches(m_ab, "0********"))
    )
    if K._dim(a) == K._dim(b):
        assert K.overlaps(a, b) == _matches(
            m_ab, "1*T***T**" if K._dim(a) == 1 else "T*T***T**"
        )
    else:
        assert not K.overlaps(a, b)


@settings(max_examples=250, deadline=None)
@given(geoms(), geoms())
def test_predicate_lattice(a, b):
    # symmetry
    assert K.intersects(a, b) == K.intersects(b, a)
    assert K.touches(a, b) == K.touches(b, a)
    assert K.overlaps(a, b) == K.overlaps(b, a)
    assert K.crosses(a, b) == K.crosses(b, a)
    assert K.equals(a, b) == K.equals(b, a)
    # duals
    assert K.disjoint(a, b) == (not K.intersects(a, b))
    assert K.within(a, b) == K.contains(b, a)
    assert K.covered_by(a, b) == K.covers(b, a)
    # implications
    if K.contains_properly(a, b):
        assert K.contains(a, b)
    if K.contains(a, b):
        assert K.covers(a, b) and K.intersects(a, b)
    if K.within(a, b):
        assert K.covered_by(a, b) and K.intersects(a, b)
    if K.touches(a, b):
        assert K.intersects(a, b) and not K.within(a, b) and not K.contains(a, b)
    if K.equals(a, b):
        assert K.covers(a, b) and K.covered_by(a, b)


@settings(max_examples=200, deadline=None)
@given(geoms(), geoms())
def test_distance_dwithin_consistency(a, b):
    d = K.distance(a, b)
    assert K.dwithin(a, b, d + 1e-9)
    if K.intersects(a, b):
        assert d == 0.0
    if d > 0:
        assert not K.dwithin(a, b, d * 0.99)
        assert not K.intersects(a, b)
