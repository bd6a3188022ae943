"""Geo function tests: haversine distance, bbox/polygon containment, grid
bucketing — validated against known geography."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hurricanedb_spark.functions import geo


def _df(spark):
    # (city, lon, lat)
    return spark.createDataFrame(
        [
            ("paris", 2.3522, 48.8566),
            ("london", -0.1276, 51.5072),
            ("nyc", -74.0060, 40.7128),
            ("sydney", 151.2093, -33.8688),
        ],
        "city string, lon double, lat double",
    ).withColumn("pt", geo.st_point(F.col("lon"), F.col("lat")))


def test_st_distance_known_values(spark):
    df = _df(spark)
    paris = df.filter(F.col("city") == "paris").select("pt").collect()[0].pt
    center = geo.st_point(F.lit(paris.lon), F.lit(paris.lat))
    out = {
        r.city: r.d
        for r in df.select("city", geo.st_distance(F.col("pt"), center).alias("d")).collect()
    }
    assert out["paris"] < 1
    assert abs(out["london"] - 343_900) < 5_000  # Paris-London ~344 km
    assert abs(out["nyc"] - 5_837_000) < 50_000  # Paris-NYC ~5837 km


def test_st_within_radius_filter(spark):
    df = _df(spark)
    paris = geo.st_point(F.lit(2.3522), F.lit(48.8566))
    near = df.filter(geo.st_within_radius(F.col("pt"), paris, 500_000))
    assert {r.city for r in near.collect()} == {"paris", "london"}


def test_bbox_contains(spark):
    df = _df(spark)
    # rough Europe box
    eu = df.filter(geo.st_contains_bbox(-10.0, 35.0, 30.0, 60.0, F.col("pt")))
    assert {r.city for r in eu.collect()} == {"paris", "london"}


def test_polygon_containment(spark):
    # triangle around the origin
    ring = F.array(
        geo.st_point(F.lit(-1.0), F.lit(-1.0)),
        geo.st_point(F.lit(1.0), F.lit(-1.0)),
        geo.st_point(F.lit(0.0), F.lit(1.5)),
        geo.st_point(F.lit(-1.0), F.lit(-1.0)),
    )
    df = spark.createDataFrame(
        [("in", 0.0, 0.0), ("out", 2.0, 0.0), ("out2", 0.0, -2.0)],
        "name string, lon double, lat double",
    ).withColumn("pt", geo.st_point(F.col("lon"), F.col("lat")))
    inside = df.filter(geo.st_within_polygon(F.col("pt"), ring))
    assert {r.name for r in inside.collect()} == {"in"}


def test_grid_cell_locality(spark):
    df = spark.createDataFrame(
        [("a", 2.3522, 48.8566), ("b", 2.3530, 48.8570), ("c", -74.0, 40.7)],
        "name string, lon double, lat double",
    ).withColumn("pt", geo.st_point(F.col("lon"), F.col("lat")))
    cells = {
        r.name: r.cell
        for r in df.select("name", geo.geo_grid_cell(F.col("pt"), 10).alias("cell")).collect()
    }
    assert cells["a"] == cells["b"]  # ~100m apart -> same res-10 cell
    assert cells["a"] != cells["c"]


def test_wkt_roundtrip(spark):
    df = spark.createDataFrame([("POINT (2.35 48.85)",)], "wkt string")
    pt = df.select(geo.st_point_from_text(F.col("wkt")).alias("p")).collect()[0].p
    assert abs(pt.lon - 2.35) < 1e-9 and abs(pt.lat - 48.85) < 1e-9
    back = df.select(
        geo.st_as_text(geo.st_point_from_text(F.col("wkt"))).alias("t")
    ).collect()[0].t
    assert back == "POINT (2.35 48.85)"


def test_st_union_points_dedups_and_orders(spark):
    from pyspark.sql import functions as F

    from hurricanedb_spark.functions.geo import (
        st_point,
        st_union_agg,
        st_union_as_text,
    )

    rows = [(1.0, 2.0), (3.0, 4.0), (1.0, 2.0), (3.0, 4.0), (0.0, -1.0)]
    df = spark.createDataFrame(rows, "lon double, lat double").select(
        st_point(F.col("lon"), F.col("lat")).alias("pt")
    )
    out = df.agg(
        st_union_as_text(st_union_agg(F.col("pt"))).alias("wkt"),
        F.size(st_union_agg(F.col("pt"))).alias("n"),
    ).collect()[0]
    assert out.n == 3
    assert out.wkt == "MULTIPOINT (0.0 -1.0, 1.0 2.0, 3.0 4.0)"


def test_polygon_wkt_roundtrip(spark):
    df = spark.range(1).select(
        geo.st_polygon_from_text(
            F.lit("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        ).alias("ring")
    )
    ring = df.collect()[0].ring
    assert [(p.lon, p.lat) for p in ring] == [
        (0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)
    ]


def test_polygon_contains_known_points(spark):
    ring = geo.st_polygon_from_text(F.lit("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 15.0, 5.0), (3, -1.0, -1.0), (4, 9.9, 9.9)],
        "id int, lon double, lat double",
    ).select("id", geo.st_point(F.col("lon"), F.col("lat")).alias("pt"))
    inside = {r.id for r in df.filter(geo.st_contains(ring, F.col("pt"))).collect()}
    assert inside == {1, 4}


def test_spherical_area_known_values(spark):
    """1°x1° quad at the equator ≈ 111.19 km × 111.19 km ≈ 1.2364e10 m²
    (spherical excess, Chamberlain–Duquette); a quad at 60°N shrinks by
    ~cos(60°) = 0.5 in the east-west direction."""
    import math

    def area_of(wkt):
        return (
            spark.range(1)
            .select(geo.st_area_spherical(geo.st_polygon_from_text(F.lit(wkt))).alias("a"))
            .collect()[0]
            .a
        )

    eq = area_of("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    # analytic: R² · Δλ · (sin φ₂ − sin φ₁)
    R = 6371008.8
    expect_eq = R * R * math.radians(1) * (math.sin(math.radians(1)) - 0)
    assert abs(eq - expect_eq) / expect_eq < 1e-6
    north = area_of("POLYGON ((0 60, 1 60, 1 61, 0 61, 0 60))")
    expect_north = R * R * math.radians(1) * (
        math.sin(math.radians(61)) - math.sin(math.radians(60))
    )
    assert abs(north - expect_north) / expect_north < 1e-6


def test_geo_to_h3_seam(spark):
    """geoToH3: with the h3 lib -> real cell ids (test vectors); without
    -> documented grid fallback with the same bucketing contract."""
    df = spark.createDataFrame(
        [(1, -122.0553238, 37.3615593)], "id int, lon double, lat double"
    )
    cell = geo.geo_to_h3(F.col("lon"), F.col("lat"), 5)
    val = df.select(cell.alias("c")).collect()[0].c
    try:
        import h3  # noqa: F401

        have = True
    except ImportError:
        have = False
    assert geo.geo_to_h3.is_real_h3 == have
    if have:
        # canonical vector from the public H3 docs for this lat/lng at res 5
        assert val == 0x85283473FFFFFFF
    else:
        # fallback: same cell for a nearby point, different for far away
        near = spark.createDataFrame(
            [(2, -122.0553, 37.3616)], "id int, lon double, lat double"
        ).select(geo.geo_to_h3(F.col("lon"), F.col("lat"), 5).alias("c")).collect()[0].c
        far = spark.createDataFrame(
            [(3, 10.0, -45.0)], "id int, lon double, lat double"
        ).select(geo.geo_to_h3(F.col("lon"), F.col("lat"), 5).alias("c")).collect()[0].c
        assert val == near != far


def test_wkb_point_roundtrip_both_endians(spark):
    import struct

    lon, lat = -122.4194, 37.7749
    le = geo.wkb_point_bytes(lon, lat, little=True)
    be = struct.pack(">BI2d", 0, geo.WKB_POINT, lon, lat)
    df = spark.createDataFrame([(1, le), (2, be)], "id int, wkb binary")
    rows = {r.id: r for r in df.select(
        "id",
        geo.st_point_from_wkb(F.col("wkb")).alias("pt"),
        geo.st_geometry_type_wkb(F.col("wkb")).alias("gt"),
    ).collect()}
    for i in (1, 2):
        assert rows[i].gt == "Point"
        assert abs(rows[i].pt.lon - lon) < 1e-12
        assert abs(rows[i].pt.lat - lat) < 1e-12

    # emit side: struct -> WKB -> struct round trip
    back = (
        df.filter("id = 1")
        .select(geo.st_point_from_wkb(F.col("wkb")).alias("pt"))
        .select(geo.st_as_wkb(F.col("pt")).alias("w"))
        .select(geo.st_point_from_wkb(F.col("w")).alias("pt2"))
        .collect()[0]
        .pt2
    )
    assert abs(back.lon - lon) < 1e-12 and abs(back.lat - lat) < 1e-12


def test_wkb_polygon_roundtrip(spark):
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    blob = geo.wkb_polygon_bytes(ring)
    df = spark.createDataFrame([(1, blob)], "id int, wkb binary")
    out = df.select(
        geo.st_polygon_from_wkb(F.col("wkb")).alias("ring"),
        geo.st_geometry_type_wkb(F.col("wkb")).alias("gt"),
    ).collect()[0]
    assert out.gt == "Polygon"
    assert [(p.lon, p.lat) for p in out.ring] == ring
    # emit and re-parse
    back = (
        df.select(geo.st_polygon_from_wkb(F.col("wkb")).alias("r"))
        .select(geo.st_polygon_as_wkb(F.col("r")).alias("w"))
        .select(geo.st_polygon_from_wkb(F.col("w")).alias("r2"))
        .collect()[0]
        .r2
    )
    assert [(p.lon, p.lat) for p in back] == ring
    # the parsed ring feeds the existing predicates once materialized as a
    # column (a Python-UDF result can't be referenced inside a HOF lambda,
    # so parse-then-predicate is the supported composition)
    inside = (
        df.select(geo.st_polygon_from_wkb(F.col("wkb")).alias("r"))
        .localCheckpoint(eager=False)
        .select(
            geo.st_within_polygon(
                geo.st_point(F.lit(2.0), F.lit(2.0)), F.col("r")
            ).alias("ok")
        )
        .collect()[0]
        .ok
    )
    assert inside


def test_st_equals_polygon_canonicalization(spark):
    # same square: rotated start vertex AND reversed orientation
    a = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    b = [(4.0, 4.0), (4.0, 0.0), (0.0, 0.0), (0.0, 4.0), (4.0, 4.0)]
    c = [(0.0, 0.0), (4.0, 0.0), (4.0, 5.0), (0.0, 4.0), (0.0, 0.0)]
    df = spark.createDataFrame(
        [(geo.wkb_polygon_bytes(a), geo.wkb_polygon_bytes(b)),
         (geo.wkb_polygon_bytes(a), geo.wkb_polygon_bytes(c))],
        "wa binary, wb binary",
    )
    rows = df.select(
        geo.st_equals_polygon(
            geo.st_polygon_from_wkb(F.col("wa")),
            geo.st_polygon_from_wkb(F.col("wb")),
        ).alias("eq")
    ).collect()
    assert rows[0].eq is True and rows[1].eq is False


def test_st_equals_point_zero_normalization(spark):
    df = spark.createDataFrame([(0.0, -0.0)], "x double, y double")
    eq = df.select(
        geo.st_equals_point(
            geo.st_point(F.col("x"), F.lit(1.0)),
            geo.st_point(F.col("y"), F.lit(1.0)),
        ).alias("eq")
    ).collect()[0].eq
    assert eq is True


def test_h3_golden_vectors(spark):
    """Golden (lat, lng, res) -> cell vectors from the public h3 test
    suite/docs, asserted whenever the real lib is importable, so the
    real-id path is no longer untested-by-construction."""
    pytest.importorskip("h3")
    import h3 as h3lib

    vectors = [
        (37.3615593, -122.0553238, 5, "85283473fffffff"),
        (37.7749, -122.4194, 9, None),
        (-41.2865, 174.7762, 7, None),
        (0.0, 0.0, 2, None),
    ]
    rows = [(i, lng, lat, res) for i, (lat, lng, res, _) in enumerate(vectors)]
    df = spark.createDataFrame(rows, "id int, lon double, lat double, res int")
    for i, (lat, lng, res, known) in enumerate(vectors):
        got = (
            df.filter(F.col("id") == i)
            .select(geo.geo_to_h3(F.col("lon"), F.col("lat"), res).alias("c"))
            .collect()[0]
            .c
        )
        expected = int(h3lib.latlng_to_cell(lat, lng, res), 16)
        assert got == expected
        if known:
            assert got == int(known, 16)


def test_polygon_wkt_emit_roundtrip(spark):
    wkt = "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0))"
    df = spark.createDataFrame([(wkt,)], "w string")
    out = (
        df.select(geo.st_polygon_from_text(F.col("w")).alias("r"))
        .select(geo.st_polygon_as_text(F.col("r")).alias("w2"))
        .collect()[0]
        .w2
    )
    assert out == wkt


def test_st_equals_pinch_ring_repeated_min_vertex(spark):
    """A pinch ring visits its minimum vertex twice; anchoring the
    canonical rotation at only the FIRST occurrence made two rotations of
    the same cyclic ring canonicalize differently (false negative). All
    min-vertex occurrences must be considered."""
    s = [(0.0, 0.0), (2.0, 0.0), (0.0, 0.0), (0.0, 2.0)]
    a = s + [s[0]]
    rot2 = s[2:] + s[:2]
    b = rot2 + [rot2[0]]
    c = [(0.0, 0.0), (2.0, 0.0), (0.0, 0.0), (0.0, 3.0), (0.0, 0.0)]
    df = spark.createDataFrame(
        [(geo.wkb_polygon_bytes(a), geo.wkb_polygon_bytes(b)),
         (geo.wkb_polygon_bytes(a), geo.wkb_polygon_bytes(c))],
        "wa binary, wb binary",
    )
    rows = df.select(
        geo.st_equals_polygon(
            geo.st_polygon_from_wkb(F.col("wa")),
            geo.st_polygon_from_wkb(F.col("wb")),
        ).alias("eq")
    ).collect()
    assert rows[0].eq is True and rows[1].eq is False


def test_st_sql_surface_matches_python_api(spark):
    """Round 7: every TransformFunctionType ST_* name resolves on the
    SQL surface (previously only stpoint/stastext/stequals/
    stgeometrytype did) and agrees with the functions/geo.py Python
    API."""
    from hurricanedb_spark.sql.dialect import HurricaneSQL

    hq = HurricaneSQL(spark)
    row = hq.sql(
        "SELECT "
        "STDISTANCE(STPOINT(2.35, 48.85), STPOINT(-0.13, 51.51)) AS d, "
        "STGEOMFROMTEXT('POINT (2.5 48.8)') AS pt, "
        "STGEOGFROMTEXT('POINT (2.5 48.8)') AS pg, "
        "STCONTAINS(STPOLYGON('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), "
        "           STPOINT(2.0, 2.0)) AS inside, "
        "STWITHIN(STPOINT(9.0, 2.0), "
        "         STPOLYGON('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS outside, "
        "STAREA(STPOLYGON('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')) AS a",
        default_limit=None,
    ).collect()[0]
    # Paris -> London ~343-344 km on the sphere model
    assert 340_000 < row["d"] < 348_000
    assert (row["pt"]["lon"], row["pt"]["lat"]) == (2.5, 48.8)
    assert (row["pg"]["lon"], row["pg"]["lat"]) == (2.5, 48.8)
    assert row["inside"] is True and row["outside"] is False
    # 1x1 degree cell at the equator ~ (111.195 km)^2
    assert 1.2e10 < row["a"] < 1.28e10
    # python-API parity on the same inputs
    df = spark.range(1).select(
        geo.st_distance(
            geo.st_point(F.lit(2.35), F.lit(48.85)),
            geo.st_point(F.lit(-0.13), F.lit(51.51)),
        ).alias("d")
    )
    assert abs(df.collect()[0]["d"] - row["d"]) < 1e-6


def test_st_wkb_sql_surface(spark):
    import base64

    from hurricanedb_spark.sql.dialect import HurricaneSQL

    hq = HurricaneSQL(spark)
    wkb = geo.wkb_point_bytes(2.5, 48.8)
    b64 = base64.b64encode(wkb).decode()
    row = hq.sql(
        f"SELECT STGEOMFROMWKB(unbase64('{b64}')) AS p, "
        f"STGEOGFROMWKB(unbase64('{b64}')) AS g",
        default_limit=None,
    ).collect()[0]
    assert (row["p"]["lon"], row["p"]["lat"]) == (2.5, 48.8)
    assert (row["g"]["lon"], row["g"]["lat"]) == (2.5, 48.8)
    # emit side round-trips bit for bit
    out = hq.sql(
        "SELECT STASBINARY(STPOINT(2.5, 48.8)) AS b", default_limit=None
    ).collect()[0]
    assert bytes(out["b"]) == wkb
    # polygon WKB through its explicit reader name
    pwkb = geo.wkb_polygon_bytes([(0, 0), (4, 0), (4, 4), (0, 0)])
    pb64 = base64.b64encode(pwkb).decode()
    ring = hq.sql(
        f"SELECT STPOLYGONFROMWKB(unbase64('{pb64}')) AS r", default_limit=None
    ).collect()[0]["r"]
    assert [(v["lon"], v["lat"]) for v in ring] == [
        (0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)
    ]
