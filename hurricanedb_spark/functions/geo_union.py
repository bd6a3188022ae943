"""Exact geometry union for the STUnion aggregate.

The reference unions arbitrary JTS geometries
(pinot-core/.../aggregation/function/StUnionAggregationFunction.java:69,
`GeometryUtils` + JTS `Geometry.union`). This module re-implements the
union for the geometry subset the engine models — POINT, LINESTRING and
single-ring POLYGON WKT — as a pure-numpy kernel that is EXACT on the
shapes it accepts and FAILS LOUDLY (`GeoUnionUnsupported`) on anything
it cannot prove, never silently coercing:

  * points                -> deduplicated MULTIPOINT
  * polygons              -> pairwise boundary-walk union of simple
                             rings; components merged to POLYGON /
                             MULTIPOLYGON
  * points + polygons     -> covered points absorbed, remainder in a
                             GEOMETRYCOLLECTION
  * linestrings           -> deduplicated MULTILINESTRING (distinct
                             lines must not cross — noding unsupported)

Documented limits (all raise GeoUnionUnsupported):
  * polygon rings with holes, or mixed line+area groups
  * degenerate boundary contact between polygons (shared vertices,
    collinear edge overlap, touching-without-crossing): the walk needs
    transversal crossings
  * unions whose result is not simply connected (a hole forms): caught
    by the area identity |A ∪ B| = |A| + |B| - |A ∩ B|, verified after
    every merge with both regions traced independently — the union can
    therefore never return a silently wrong ring.

Planar coordinates (the reference's ST_Union is the geometry — not
geography — aggregate; StUnionAggregationFunction takes serialized JTS
geometries in either mode and unions them planar-ly).
"""

from __future__ import annotations

import numpy as np


class GeoUnionUnsupported(ValueError):
    """Input outside the documented exact-union subset."""


_EPS = 1e-9


def _tol(*rings) -> float:
    scale = max((float(np.abs(r).max()) for r in rings if len(r)), default=1.0)
    return _EPS * max(1.0, scale)


# ------------------------------------------------------------------ parsing


def _parse_coords(body: str):
    pts = []
    for pair in body.split(","):
        xy = pair.split()
        if len(xy) != 2:
            raise GeoUnionUnsupported(f"malformed coordinate pair {pair!r}")
        pts.append((float(xy[0]), float(xy[1])))
    return pts


def parse_wkt_geometry(wkt: str):
    """WKT -> ('point', (x, y)) | ('linestring', [(x, y)...]) |
    ('polygon', ndarray ring CCW, closing vertex dropped). Only the
    single-ring polygon form is accepted; holes raise."""
    s = wkt.strip()
    up = s.upper()
    if up.startswith("POINT"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        (pt,) = _parse_coords(inner)
        return ("point", pt)
    if up.startswith("LINESTRING"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        pts = _parse_coords(inner)
        if len(pts) < 2:
            raise GeoUnionUnsupported(f"degenerate linestring {wkt!r}")
        return ("linestring", pts)
    if up.startswith("POLYGON"):
        inner = s[s.index("(") + 1 : s.rindex(")")].strip()
        if not (inner.startswith("(") and inner.endswith(")")):
            raise GeoUnionUnsupported(f"malformed polygon {wkt!r}")
        rings = inner[1:-1].split("),")
        if len(rings) != 1:
            raise GeoUnionUnsupported(
                "polygon holes are outside the exact-union subset"
            )
        pts = _parse_coords(rings[0].replace("(", "").replace(")", ""))
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]
        ring = np.asarray(pts, dtype=np.float64)
        if len(ring) < 3:
            raise GeoUnionUnsupported(f"degenerate polygon {wkt!r}")
        if _shoelace(ring) < 0:
            ring = ring[::-1].copy()
        if abs(_shoelace(ring)) <= _tol(ring) ** 2:
            raise GeoUnionUnsupported(f"zero-area polygon {wkt!r}")
        return ("polygon", ring)
    raise GeoUnionUnsupported(f"unsupported WKT geometry {wkt!r}")


# --------------------------------------------------------------- primitives


def _shoelace(ring) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(
        np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    )


def _point_in_ring(pt, ring, tol) -> int:
    """+1 strictly inside, 0 on boundary (within tol), -1 outside."""
    x, y = pt
    n = len(ring)
    inside = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        # on-segment check
        dx, dy = x2 - x1, y2 - y1
        seg_len2 = dx * dx + dy * dy
        t = ((x - x1) * dx + (y - y1) * dy) / seg_len2 if seg_len2 else 0.0
        t = min(1.0, max(0.0, t))
        if (x - (x1 + t * dx)) ** 2 + (y - (y1 + t * dy)) ** 2 <= tol * tol:
            return 0
        if (y1 > y) != (y2 > y):
            xin = x1 + (y - y1) / (y2 - y1) * dx
            if x < xin:
                inside = not inside
    return 1 if inside else -1


def _crossings(a, b, tol):
    """Proper transversal crossings between ring boundaries as
    [(param_a, param_b, point)], params = edge_index + t in [0, n).
    Degenerate contact (endpoint-on-edge, collinear overlap, shared
    vertices) raises — the boundary walk requires clean crossings."""
    out = []
    na, nb = len(a), len(b)
    for i in range(na):
        p1, p2 = a[i], a[(i + 1) % na]
        d1 = p2 - p1
        for j in range(nb):
            q1, q2 = b[j], b[(j + 1) % nb]
            d2 = q2 - q1
            denom = d1[0] * d2[1] - d1[1] * d2[0]
            diff = q1 - p1
            if abs(denom) <= tol * tol:
                # parallel: collinear overlap is degenerate contact
                cross = diff[0] * d1[1] - diff[1] * d1[0]
                if abs(cross) <= tol * max(
                    1.0, float(np.hypot(*d1))
                ) and _seg_overlap_1d(p1, p2, q1, q2, tol):
                    raise GeoUnionUnsupported(
                        "collinear edge overlap between polygons"
                    )
                continue
            t = (diff[0] * d2[1] - diff[1] * d2[0]) / denom
            u = (diff[0] * d1[1] - diff[1] * d1[0]) / denom
            lt = tol / max(tol, float(np.hypot(*d1)))
            lu = tol / max(tol, float(np.hypot(*d2)))
            if -lt < t < 1 + lt and -lu < u < 1 + lu:
                if t < lt or t > 1 - lt or u < lu or u > 1 - lu:
                    raise GeoUnionUnsupported(
                        "degenerate boundary contact (vertex touching); "
                        "exact union needs transversal crossings"
                    )
                out.append((i + t, j + u, p1 + t * d1))
    return out


def _seg_overlap_1d(p1, p2, q1, q2, tol) -> bool:
    d = p2 - p1
    axis = 0 if abs(d[0]) >= abs(d[1]) else 1
    lo, hi = sorted((p1[axis], p2[axis]))
    qlo, qhi = sorted((q1[axis], q2[axis]))
    return qhi > lo + tol and qlo < hi - tol


def _chain(ring, params_points):
    """Cyclic event chain for one ring: [(param, point, crossing_id)],
    vertices carry crossing_id None."""
    events = [(float(i), ring[i], None) for i in range(len(ring))]
    events += [(p, pt, cid) for p, pt, cid in params_points]
    events.sort(key=lambda e: e[0])
    return events


def _walk(a, b, crossings, tol, mode) -> np.ndarray:
    """Trace one boundary of union ('union') or intersection ('inter')
    of CCW rings a, b with proper crossings. Union: start from a vertex
    of a strictly outside b and switch rings at every crossing.
    Intersection: start from a crossing and at each crossing follow the
    ring whose next sub-segment stays inside the other."""
    chains = {
        "a": _chain(a, [(pa, pt, k) for k, (pa, _, pt) in enumerate(crossings)]),
        "b": _chain(b, [(pb, pt, k) for k, (_, pb, pt) in enumerate(crossings)]),
    }
    rings = {"a": a, "b": b}
    other = {"a": "b", "b": "a"}
    cross_param = {
        "a": {k: pa for k, (pa, _, _) in enumerate(crossings)},
        "b": {k: pb for k, (_, pb, _) in enumerate(crossings)},
    }

    def next_event(side, param):
        ch = chains[side]
        for e in ch:
            if e[0] > param + 1e-12:
                return e
        return ch[0]  # wrap

    def seg_mid_after(side, param):
        ch, ring = chains[side], rings[side]
        nxt = next_event(side, param)
        n = len(ring)
        start_pt = _point_at(ring, param)
        end_param = nxt[0] if nxt[0] > param else nxt[0] + n
        end_pt = _point_at(ring, end_param % n)
        return 0.5 * (start_pt + end_pt)

    def inter_side(cid):
        """The ring to follow after crossing `cid` when tracing the
        intersection: whichever ring's next sub-segment stays inside
        (or on) the other ring."""
        for s in ("a", "b"):
            mid = seg_mid_after(s, cross_param[s][cid])
            if _point_in_ring(mid, rings[other[s]], tol) >= 0:
                return s
        raise GeoUnionUnsupported("intersection trace lost containment")

    if mode == "union":
        # a start vertex strictly outside the other ring; check BOTH
        # rings (a non-convex pair can have every vertex of one inside
        # the other while its edges still cross out and back)
        side = start = None
        for s in ("a", "b"):
            start = next(
                (
                    i
                    for i, v in enumerate(rings[s])
                    if _point_in_ring(v, rings[other[s]], tol) < 0
                ),
                None,
            )
            if start is not None:
                side = s
                break
        if side is None:
            raise GeoUnionUnsupported(
                "no vertex of either polygon lies outside the other"
            )
        param = float(start)
        start_key = (side, start)
        pts = [rings[side][start]]
    else:
        side = inter_side(0)
        param = cross_param[side][0]
        start_key = ("x", 0)
        pts = [crossings[0][2]]

    max_steps = 4 * (len(a) + len(b) + 2 * len(crossings)) + 8
    for _ in range(max_steps):
        ev_param, ev_pt, cid = next_event(side, param)
        if cid is not None:
            key = ("x", cid)
        else:
            key = (side, int(round(ev_param)) % len(rings[side]))
        if key == start_key:
            return np.asarray(pts)
        pts.append(ev_pt)
        if cid is not None:
            # union switches rings at every crossing; intersection
            # follows containment
            side = other[side] if mode == "union" else inter_side(cid)
            param = cross_param[side][cid]
        else:
            param = ev_param % len(rings[side])
    raise GeoUnionUnsupported("boundary walk did not close")


def _point_at(ring, param):
    n = len(ring)
    i = int(param) % n
    t = param - int(param)
    return ring[i] + t * (ring[(i + 1) % n] - ring[i])


def _merge_two(a, b):
    """Union of two simple CCW rings. Returns None when disjoint, one
    ring when merged/contained; raises on degenerate contact or when
    the area identity fails (e.g. the union would have a hole)."""
    tol = _tol(a, b)
    crossings = _crossings(a, b, tol)
    if not crossings:
        in_b = [_point_in_ring(v, b, tol) for v in a]
        in_a = [_point_in_ring(v, a, tol) for v in b]
        if all(s > 0 for s in in_b):
            return b
        if all(s > 0 for s in in_a):
            return a
        if all(s < 0 for s in in_b) and all(s < 0 for s in in_a):
            return None  # disjoint
        raise GeoUnionUnsupported(
            "polygons touch without crossing (degenerate contact)"
        )
    union = _walk(a, b, crossings, tol, "union")
    inter = _walk(a, b, crossings, tol, "inter")
    area_u, area_i = abs(_shoelace(union)), abs(_shoelace(inter))
    expect = abs(_shoelace(a)) + abs(_shoelace(b)) - area_i
    scale = max(expect, 1.0)
    if abs(area_u - expect) > 1e-6 * scale:
        raise GeoUnionUnsupported(
            "union area identity failed (result not simply connected — "
            f"|A|+|B|-|A∩B|={expect:.12g} but traced ring={area_u:.12g})"
        )
    return union


def union_polygons(rings: list) -> list:
    """Merge overlapping components; returns disjoint CCW rings."""
    comps = [np.asarray(r, dtype=np.float64) for r in rings]
    merged = True
    while merged:
        merged = False
        for i in range(len(comps)):
            for j in range(i + 1, len(comps)):
                m = _merge_two(comps[i], comps[j])
                if m is not None:
                    comps = (
                        [c for k, c in enumerate(comps) if k not in (i, j)]
                        + [m]
                    )
                    merged = True
                    break
            if merged:
                break
    return comps


# ------------------------------------------------------------------ output


def _num(x: float) -> str:
    return f"{float(x):.12g}"


def _ring_wkt(ring) -> str:
    start = int(np.lexsort((ring[:, 1], ring[:, 0]))[0])
    seq = np.concatenate([ring[start:], ring[:start], ring[start : start + 1]])
    return "(" + ", ".join(f"{_num(x)} {_num(y)}" for x, y in seq) + ")"


def _sorted_rings(rings):
    return sorted(rings, key=lambda r: (float(r[:, 0].min()), float(r[:, 1].min())))


def union_wkt(wkts) -> str | None:
    """The STUnion aggregate over a group's WKT values. NULLs skipped;
    empty group -> None (the reference's default null result)."""
    points, lines, polys = [], [], []
    for w in wkts:
        if w is None:
            continue
        kind, val = parse_wkt_geometry(w)
        if kind == "point":
            points.append(val)
        elif kind == "linestring":
            lines.append(val)
        else:
            polys.append(val)
    if not points and not lines and not polys:
        return None
    if lines and (points or polys):
        raise GeoUnionUnsupported(
            "mixed linestring + point/polygon union is outside the "
            "exact subset"
        )
    if lines:
        # direction-insensitive dedup; output in the canonical (smaller)
        # direction so results are deterministic across row orders
        keys = {min(tuple(ln), tuple(reversed(ln))) for ln in lines}
        distinct = [list(k) for k in sorted(keys)]
        _check_lines_disjoint(distinct)
        bodies = [
            "(" + ", ".join(f"{_num(x)} {_num(y)}" for x, y in ln) + ")"
            for ln in distinct
        ]
        if len(bodies) == 1:
            return f"LINESTRING {bodies[0]}"
        return "MULTILINESTRING (" + ", ".join(bodies) + ")"
    comps = _sorted_rings(union_polygons(polys)) if polys else []
    if points and comps:
        tol = _tol(*comps)
        points = [
            p
            for p in points
            if all(_point_in_ring(p, c, tol) < 0 for c in comps)
        ]
    uniq_pts = sorted(set(points))
    parts = []
    for c in comps:
        parts.append(f"POLYGON ({_ring_wkt(c)})")
    for p in uniq_pts:
        parts.append(f"POINT ({_num(p[0])} {_num(p[1])})")
    if not comps:
        if len(uniq_pts) == 1:
            return parts[0]
        return (
            "MULTIPOINT ("
            + ", ".join(f"{_num(x)} {_num(y)}" for x, y in uniq_pts)
            + ")"
        )
    if not uniq_pts:
        if len(comps) == 1:
            return parts[0]
        return (
            "MULTIPOLYGON ("
            + ", ".join(_ring_wkt(c) for c in comps)
            + ")"
        )
    return "GEOMETRYCOLLECTION (" + ", ".join(parts) + ")"


def _check_lines_disjoint(lines) -> None:
    for i in range(len(lines)):
        for j in range(i + 1, len(lines)):
            a = np.asarray(lines[i])
            b = np.asarray(lines[j])
            tol = _tol(a, b)
            for s in range(len(a) - 1):
                for t in range(len(b) - 1):
                    if _segments_cross(a[s], a[s + 1], b[t], b[t + 1], tol):
                        raise GeoUnionUnsupported(
                            "crossing linestrings need noding — outside "
                            "the exact subset"
                        )


def _segments_cross(p1, p2, q1, q2, tol) -> bool:
    d1, d2 = p2 - p1, q2 - q1
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) <= tol * tol:
        return False
    diff = q1 - p1
    t = (diff[0] * d2[1] - diff[1] * d2[0]) / denom
    u = (diff[0] * d1[1] - diff[1] * d1[0]) / denom
    lt = tol / max(tol, float(np.hypot(*d1)))
    lu = tol / max(tol, float(np.hypot(*d2)))
    return lt < t < 1 - lt and lu < u < 1 - lu
