"""Geospatial query coverage — the reference's H3-index filter shapes
(H3IndexFilterOperator distance queries, H3InclusionIndexFilterOperator
ST_Within) over deterministic synthetic coordinates derived from customer
keys. Distance values involve libm trig (sin/cos differ by <1ulp across
engines), so the oracle compares grid cells and counts, not raw meters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.queries._fixture import (
    fixture_stale,
    write_fixture_marker,
)
from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.functions import geo
from hurricanedb_spark.queries import register


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic geography: lon/lat from customer key."""
    cu = load_table(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") * 7 % 360 - 180).cast("double")
    lat = (F.col("c_custkey") * 13 % 180 - 90).cast("double")
    return cu.select(
        "c_custkey",
        "c_mktsegment",
        lon.alias("lon"),
        lat.alias("lat"),
        geo.st_point(lon, lat).alias("pt"),
    )


@register(
    "q_geo_grid_contains",
    oracle="""
    WITH pts AS (
      SELECT c_custkey, c_mktsegment,
             CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) AS lon,
             CAST(c_custkey * 13 % 180 - 90 AS DOUBLE) AS lat
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE lon BETWEEN -10 AND 30 AND lat BETWEEN 35 AND 60) AS n_in_bbox,
           COUNT(DISTINCT
             CAST(6 * 1099511627776 +
                  least(CAST(floor((lat + 90.0) / 180.0 * 64) AS BIGINT), 63) * 1048576 +
                  least(CAST(floor((lon + 180.0) / 360.0 * 64) AS BIGINT), 63) AS BIGINT)
           ) AS n_cells,
           COUNT(*) AS n
    FROM pts
    GROUP BY c_mktsegment
    """,
    doc="Geo containment + grid bucketing (ST_Contains bbox semantics of "
    "H3InclusionIndexFilterOperator; geoToH3 analog grid cells at res 6). "
    "Distances use libm trig (not cross-engine bit-stable) so the oracle "
    "checks the integer-deterministic surface; metric distance values are "
    "validated against known geography in tests/test_geo.py.",
    tags=("geo",),
)
def q_geo_grid_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    in_bbox = geo.st_contains_bbox(-10.0, 35.0, 30.0, 60.0, F.col("pt"))
    return pts.groupBy("c_mktsegment").agg(
        F.count(F.when(in_bbox, 1)).alias("n_in_bbox"),
        F.countDistinct(geo.geo_grid_cell(F.col("pt"), 6)).alias("n_cells"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_st_union_points",
    oracle="""
    WITH pts AS (
      SELECT c_mktsegment,
             CAST(c_custkey * 7 % 360 - 180 AS INT) AS lon,
             CAST(c_custkey * 13 % 180 - 90 AS INT) AS lat
      FROM customer
    ),
    wkts AS (
      SELECT c_mktsegment, CAST(lon AS VARCHAR) || ' ' || CAST(lat AS VARCHAR) AS wkt
      FROM pts
    )
    SELECT c_mktsegment,
           'MULTIPOINT (' || string_agg(DISTINCT wkt, ', ' ORDER BY wkt) || ')'
             AS union_wkt,
           COUNT(DISTINCT wkt) AS n_points
    FROM wkts
    GROUP BY c_mktsegment
    """,
    doc="STUnion aggregate (AggregationFunctionType.java:73, "
    "StUnionAggregationFunction): per-segment union of point geographies "
    "as a deduplicated, deterministically ordered MULTIPOINT, plus its "
    "cardinality. Point coords are integral by construction so the WKT "
    "text is bit-identical across engines.",
    tags=("geo", "aggregate"),
)
def q_st_union_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") * 7 % 360 - 180).cast("int")
    lat = (F.col("c_custkey") * 13 % 180 - 90).cast("int")
    wkt = F.concat(lon.cast("string"), F.lit(" "), lat.cast("string"))
    pts = cu.select("c_mktsegment", wkt.alias("wkt"))
    union = F.array_sort(F.collect_set("wkt"))
    return pts.groupBy("c_mktsegment").agg(
        F.concat(
            F.lit("MULTIPOINT ("), F.concat_ws(", ", union), F.lit(")")
        ).alias("union_wkt"),
        F.size(union).cast("long").alias("n_points"),
    )


# hand-computed golden unions for the full-geometry STUnion form: the
# Spark side runs the exact boundary-walk kernel (functions/geo_union.py)
# over literal geometries; the oracle states the independently
# hand-derived results, so the driver gate proves the kernel, not the
# kernel proving itself
_ST_UNION_GEOM_CASES = [
    # overlapping squares -> L-shaped 8-vertex union (area 4+4-1=7)
    (1, ["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"],
     "POLYGON ((0 0, 2 0, 2 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 0))"),
    # disjoint squares -> MULTIPOLYGON, components sorted by min vertex
    (2, ["POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))",
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"],
     "MULTIPOLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), "
     "(10 10, 11 10, 11 11, 10 11, 10 10))"),
    # point+polygon mix: covered point absorbed, outside point kept
    (3, ["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (1 1)",
         "POINT (9 9)"],
     "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), "
     "POINT (9 9))"),
    # plus-sign: two rectangles, four transversal crossings
    (4, ["POLYGON ((-3 -1, 3 -1, 3 1, -3 1, -3 -1))",
         "POLYGON ((-1 -3, 1 -3, 1 3, -1 3, -1 -3))"],
     "POLYGON ((-3 -1, -1 -1, -1 -3, 1 -3, 1 -1, 3 -1, 3 1, 1 1, "
     "1 3, -1 3, -1 1, -3 1, -3 -1))"),
    # deduplicated non-crossing linestrings
    (5, ["LINESTRING (0 0, 1 1)", "LINESTRING (1 1, 2 0)",
         "LINESTRING (0 0, 1 1)"],
     "MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))"),
]


@register(
    "q_st_union_geoms",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        "({}, '{}')".format(g, expected)
        for g, _, expected in _ST_UNION_GEOM_CASES
    )
    + ") AS t(g, union_wkt)",
    doc="STUnion over full WKT geometries "
    "(StUnionAggregationFunction.java:69 unions arbitrary JTS "
    "geometries): overlapping/disjoint polygon unions via the exact "
    "boundary-walk kernel with the |A|+|B|-|A∩B| area-identity proof, "
    "point absorption, GEOMETRYCOLLECTION output, linestring dedup. The "
    "oracle is the independently hand-computed union per group.",
    tags=("geo", "aggregate"),
)
def q_st_union_geoms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hurricanedb_spark.functions.geo import st_union_wkt_agg

    rows = [(g, w) for g, wkts, _ in _ST_UNION_GEOM_CASES for w in wkts]
    df = spark.createDataFrame(rows, "g int, geom string")
    return (
        df.groupBy("g")
        .agg(st_union_wkt_agg(F.col("geom")).alias("union_wkt"))
        .orderBy("g")
    )


# simple (convex-ish) test polygon over the synthetic coordinate space;
# closed ring, lon/lat integral so both engines see identical doubles
_RING = [(-10, 35), (30, 35), (40, 55), (0, 65), (-15, 50), (-10, 35)]
_POLY_WKT = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in _RING) + "))"


def _raycast_sql(lon: str, lat: str) -> str:
    """DuckDB ray-casting over the fixed ring — the same IEEE double
    arithmetic the Spark expression performs, one CASE term per edge, so
    the inside/outside verdicts are bit-identical across engines."""
    terms = []
    for (ax, ay), (bx, by) in zip(_RING, _RING[1:]):
        terms.append(
            f"CASE WHEN ((CAST({ay} AS DOUBLE) > {lat}) <> "
            f"(CAST({by} AS DOUBLE) > {lat})) AND "
            f"{lon} < (CAST({bx} AS DOUBLE) - CAST({ax} AS DOUBLE)) * "
            f"({lat} - CAST({ay} AS DOUBLE)) / "
            f"(CAST({by} AS DOUBLE) - CAST({ay} AS DOUBLE)) + "
            f"CAST({ax} AS DOUBLE) THEN 1 ELSE 0 END"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


@register(
    "q_geo_polygon_contains",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, c_mktsegment,
             CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) AS lon,
             CAST(c_custkey * 13 % 180 - 90 AS DOUBLE) AS lat
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE {_raycast_sql('lon', 'lat')}) AS n_inside,
           COUNT(*) AS n
    FROM pts
    GROUP BY c_mktsegment
    """,
    doc="General polygon containment (StContainsFunction / "
    "H3InclusionIndexFilterOperator ST_Within over a real polygon, not a "
    "bbox): WKT ring parsed by st_polygon_from_text, ray-casting "
    "st_contains as codegen'd higher-order expressions; oracle runs the "
    "identical edge arithmetic as generated SQL. ST_Area for the same "
    "ring is validated against known geodesic values in tests/test_geo.py "
    "(trig is not cross-engine bit-stable).",
    tags=("geo",),
)
def q_geo_polygon_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    ring = geo.st_polygon_from_text(F.lit(_POLY_WKT))
    inside = geo.st_contains(ring, F.col("pt"))
    return pts.groupBy("c_mktsegment").agg(
        F.count(F.when(inside, 1)).alias("n_inside"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_geo_radius_join",
    oracle=None,  # haversine uses libm trig; validated in tests/test_geo.py
    doc="Distance-radius filter (H3IndexFilterOperator shape: "
    "ST_Distance(col, point) < r): customers within 5000 km of a center "
    "point, counted per segment. Rows-only check.",
    tags=("geo",),
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    center = geo.st_point(F.lit(0.0), F.lit(45.0))
    return (
        pts.filter(geo.st_within_radius(F.col("pt"), center, 5_000_000.0))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_nearby"))
    )


@register(
    "q_geo_index_radius",
    oracle=None,  # haversine uses libm trig; equality with the expression
    # path is asserted INSIDE the query, so the rows-only check still
    # proves the index path end to end
    doc="Geo grid index end to end (H3IndexFilterOperator.java:100-160 "
    "analog, sources/geo_index.py): customer points sealed as v3 "
    "segments with a .h3.idx on the WKT column, ST_Distance < r "
    "answered via candidate-cell posting union + exact haversine "
    "residual; the query raises unless the accelerated result equals "
    "the expression scan.",
    tags=("geo", "sources", "segment-format"),
)
def q_geo_index_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hurricanedb_spark.sources import geo_index as gi
    from hurricanedb_spark.sources import pinot_segment as ps

    base = os.path.join(
        "/tmp/hurricanedb_segments",
        os.path.basename(os.path.normpath(sf_dir)) + "_customer_geoidx",
    )
    marker = os.path.join(base, "_written")
    if fixture_stale(marker, sf_dir):
        pts = _points(spark, sf_dir).select(
            "c_custkey",
            "c_mktsegment",
            F.concat(
                F.lit("POINT ("),
                F.col("pt.lon").cast("string"),
                F.lit(" "),
                F.col("pt.lat").cast("string"),
                F.lit(")"),
            ).alias("loc"),
        )
        ps.export_segments(
            pts.repartition(4), base, geo_index_columns={"loc": 10}
        )
        write_fixture_marker(marker, sf_dir)
    segs = sorted(
        os.path.join(base, d)
        for d in os.listdir(base)
        if os.path.isdir(os.path.join(base, d))
    )
    lon, lat, r = 10.0, 47.0, 800_000.0
    fast = gi.read_segments_geo_radius(spark, segs, "loc", lon, lat, r)
    slow = ps.read_segments(spark, segs).filter(
        F.expr(gi.radius_residual_expr("loc", lon, lat, r))
    )
    fk = sorted(x["c_custkey"] for x in fast.collect())
    sk = sorted(x["c_custkey"] for x in slow.collect())
    if fk != sk:
        raise RuntimeError(
            f"geo index path diverged from expression path: "
            f"{len(fk)} vs {len(sk)} rows"
        )
    return (
        fast.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_nearby"))
        .orderBy("c_mktsegment")
    )


@register(
    "q_fn_geo_sql",
    oracle="""
    WITH pts AS (
      SELECT c_mktsegment,
             CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) AS lon,
             CAST(c_custkey * 13 % 180 - 90 AS DOUBLE) AS lat
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN (
             (CASE WHEN ((-40 > lat) <> (-30 > lat))
                    AND (lon < (60 - -50) * (lat - -40) / (-30 - -40) + -50)
                   THEN 1 ELSE 0 END
              + CASE WHEN ((-30 > lat) <> (70 > lat))
                      AND (lon < (10 - 60) * (lat - -30) / (70 - -30) + 60)
                     THEN 1 ELSE 0 END
              + CASE WHEN ((70 > lat) <> (-40 > lat))
                      AND (lon < (-50 - 10) * (lat - 70) / (-40 - 70) + 10)
                     THEN 1 ELSE 0 END) % 2 = 1
           ) THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
    FROM pts
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="ST_* family on the SQL surface (round 7): "
    "STCONTAINS(STPOLYGON('POLYGON (...)'), STPOINT(lon, lat)) through "
    "the dialect macro layer — ray-casting crossings count as pure "
    "arithmetic expressions (cross-engine deterministic, unlike the "
    "libm-trig distances). The oracle hand-unrolls the SAME formula for "
    "the fixed triangle, edge for edge, operand order preserved.",
    tags=("geo", "dialect"),
)
def q_fn_geo_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hurricanedb_spark.sql.dialect import HurricaneSQL

    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_geo_sql"
    )
    hq = HurricaneSQL(spark)
    return hq.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN STCONTAINS(
                 STPOLYGON('POLYGON ((-50 -40, 60 -30, 10 70, -50 -40))'),
                 STPOINT(CAST(c_custkey * 7 % 360 - 180 AS DOUBLE),
                         CAST(c_custkey * 13 % 180 - 90 AS DOUBLE))
               ) THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
        FROM customer_geo_sql
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        LIMIT 100
        """,
        default_limit=None,
    )
