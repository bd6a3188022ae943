"""Exact STUnion over full geometries (round-8 item 4).

Golden tests vs hand-computed unions for the boundary-walk kernel
(functions/geo_union.py), and loud-degradation tests for every
documented limit — the reference unions arbitrary JTS geometries
(StUnionAggregationFunction.java:69); this subset is exact or it raises.
"""

from __future__ import annotations

import numpy as np
import pytest

from hurricanedb_spark.functions.geo_union import (
    GeoUnionUnsupported,
    _shoelace,
    parse_wkt_geometry,
    union_wkt,
)

SQ = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"


def area_of(wkt: str) -> float:
    kind, ring = parse_wkt_geometry(wkt)
    assert kind == "polygon"
    return abs(_shoelace(ring))


GOLDEN = [
    # overlap: L-shape, area 7
    ([SQ, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"],
     "POLYGON ((0 0, 2 0, 2 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 0))"),
    # containment collapses to the outer ring
    ([SQ, "POLYGON ((0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))"], SQ),
    # disjoint -> MULTIPOLYGON sorted by min vertex
    ([SQ, "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"],
     "MULTIPOLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), "
     "(10 10, 11 10, 11 11, 10 11, 10 10))"),
    # plus-sign: 4 transversal crossings, still a single simple ring
    (["POLYGON ((-3 -1, 3 -1, 3 1, -3 1, -3 -1))",
      "POLYGON ((-1 -3, 1 -3, 1 3, -1 3, -1 -3))"],
     "POLYGON ((-3 -1, -1 -1, -1 -3, 1 -3, 1 -1, 3 -1, 3 1, 1 1, 1 3, "
     "-1 3, -1 1, -3 1, -3 -1))"),
    # points dedup
    (["POINT (1 2)", "POINT (0 0)", "POINT (1 2)"],
     "MULTIPOINT (0 0, 1 2)"),
    (["POINT (3 4)"], "POINT (3 4)"),
    # point absorbed by polygon; outsider kept
    ([SQ, "POINT (1 1)", "POINT (9 9)"],
     "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), "
     "POINT (9 9))"),
    # linestrings: dedup (direction-insensitive), touching allowed
    (["LINESTRING (0 0, 1 1)", "LINESTRING (1 1, 0 0)",
      "LINESTRING (1 1, 2 0)"],
     "MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))"),
    (["LINESTRING (0 0, 5 5)"], "LINESTRING (0 0, 5 5)"),
]


@pytest.mark.parametrize("wkts,expected", GOLDEN)
def test_golden_unions(wkts, expected):
    assert union_wkt(wkts) == expected
    # order independence (the aggregate sees arbitrary row order)
    assert union_wkt(list(reversed(wkts))) == expected


def test_cw_ring_normalized():
    cw = "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))"
    assert union_wkt([cw]) == SQ


def test_triple_chain_exact_area():
    a = SQ
    b = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    c = "POLYGON ((2.5 -0.5, 4 -0.5, 4 1.4, 2.5 1.4, 2.5 -0.5))"
    out = union_wkt([a, b, c])
    # inclusion-exclusion: |a|+|b|+|c| - |a∩b| - |b∩c| (a,c disjoint)
    expected = 4 + 4 + 1.5 * 1.9 - 1 - 0.5 * 0.4
    assert abs(area_of(out) - expected) < 1e-9


def test_union_area_identity_random_pairs():
    rng = np.random.default_rng(7)
    for _ in range(25):
        # random convex quadrilaterals via hull of 4 points (retry thin)
        def quad():
            while True:
                pts = rng.uniform(0, 10, (4, 2)).round(2)
                c = pts.mean(axis=0)
                ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
                ring = pts[np.argsort(ang)]
                if abs(_shoelace(ring)) > 1.0 and len(np.unique(ring, axis=0)) == 4:
                    return ring
        a, b = quad(), quad()
        wa = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in a) + f", {a[0][0]} {a[0][1]}))"
        wb = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in b) + f", {b[0][0]} {b[0][1]}))"
        try:
            out = union_wkt([wa, wb])
        except GeoUnionUnsupported:
            continue  # degenerate contact: loud, acceptable
        kind, _ = (("multi", None) if out.startswith("MULTI") else
                   parse_wkt_geometry(out))
        if kind == "polygon":
            # the kernel itself verifies |A|+|B|-|A∩B|; re-verify one side
            assert area_of(out) <= abs(_shoelace(a)) + abs(_shoelace(b)) + 1e-9
            assert area_of(out) >= max(abs(_shoelace(a)), abs(_shoelace(b))) - 1e-9


LOUD = [
    # hole would form: U-shape bridged by a bar
    (["POLYGON ((0 0, 3 0, 3 3, 2 3, 2 1, 1 1, 1 3, 0 3, 0 0))",
      "POLYGON ((-1 1.5, 4 1.5, 4 2.5, -1 2.5, -1 1.5))"],
     "area identity"),
    # edge-touching squares (degenerate contact)
    ([SQ, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))"], "contact"),
    # crossing linestrings need noding
    (["LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)"], "noding"),
    # mixed line + polygon
    ([SQ, "LINESTRING (5 5, 6 6)"], "mixed"),
    # polygon with a hole
    (["POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))"],
     "holes"),
    # unsupported geometry kind
    (["MULTIPOINT (0 0, 1 1)"], "unsupported"),
]


@pytest.mark.parametrize("wkts,msg", LOUD)
def test_documented_limits_raise(wkts, msg):
    with pytest.raises(GeoUnionUnsupported, match=msg):
        union_wkt(wkts)


def test_nulls_and_empty_group():
    assert union_wkt([None, None]) is None
    assert union_wkt([]) is None
    assert union_wkt([None, "POINT (1 1)"]) == "POINT (1 1)"


def test_sql_surface_registration(spark):
    from hurricanedb_spark.functions.registry import register_all

    register_all(spark)
    df = spark.createDataFrame(
        [(1, SQ), (1, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")],
        "g int, geom string",
    )
    df.createOrReplaceTempView("geo_union_t")
    row = spark.sql(
        "SELECT stUnionWKT(geom) AS u FROM geo_union_t GROUP BY g"
    ).collect()[0]
    assert row["u"].startswith("POLYGON ((0 0, 2 0, 2 1, 3 1")
