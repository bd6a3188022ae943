"""Minimal geospatial surface (TransformFunctionType.java:124-146,
pinot-core/.../geospatial/transform/function/).

The reference supports WKT/WKB constructors, point distance, containment
relations and H3 bucketing over a custom geometry type. Without a geometry
library in the container, the Spark-first design represents:

  POINT      -> struct<lon double, lat double> built by st_point()
  POLYGON    -> array<struct<lon,lat>> ring (closed) from restricted WKT

and implements the measures used by the reference's filter operators
(H3IndexFilterOperator distance queries, H3InclusionIndexFilterOperator
ST_Within) as JVM-side expressions: haversine distance and ray-casting
point-in-polygon via higher-order functions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EARTH_RADIUS_M = 6371008.8


def st_point(lon: Column, lat: Column) -> Column:
    """ST_Point(lon, lat) -> struct geometry."""
    return F.struct(lon.cast("double").alias("lon"), lat.cast("double").alias("lat"))


def st_as_text(point: Column) -> Column:
    """ST_AsText for points."""
    return F.concat(
        F.lit("POINT ("), point["lon"].cast("string"), F.lit(" "),
        point["lat"].cast("string"), F.lit(")"),
    )


def st_point_from_text(wkt: Column) -> Column:
    """ST_GeomFromText for 'POINT (lon lat)'."""
    nums = F.regexp_extract(wkt, r"POINT\s*\(\s*([-\d.]+)\s+([-\d.]+)\s*\)", 0)
    lon = F.regexp_extract(wkt, r"POINT\s*\(\s*([-\d.]+)\s+([-\d.]+)\s*\)", 1)
    lat = F.regexp_extract(wkt, r"POINT\s*\(\s*([-\d.]+)\s+([-\d.]+)\s*\)", 2)
    return F.when(
        nums != "", F.struct(lon.cast("double").alias("lon"), lat.cast("double").alias("lat"))
    )


def st_distance(a: Column, b: Column) -> Column:
    """ST_Distance on geographies: haversine great-circle distance in meters
    (matches the reference's StDistanceFunction sphere model), built from
    Spark trig expressions — codegen'd, no UDF."""
    lat1, lat2 = F.radians(a["lat"]), F.radians(b["lat"])
    dlat = F.radians(b["lat"] - a["lat"])
    dlon = F.radians(b["lon"] - a["lon"])
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(
        F.sin(dlon / 2), 2
    )
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def st_within_radius(point: Column, center: Column, radius_m) -> Column:
    """The reference's H3 distance-filter shape:
    ST_Distance(col, point) < r (H3IndexFilterOperator.java) — the H3 index
    is an access-path optimization; semantics are just the predicate."""
    return st_distance(point, center) < radius_m


def st_contains_bbox(min_lon, min_lat, max_lon, max_lat, point: Column) -> Column:
    """ST_Contains for a rectangular region over a point column."""
    return (
        (point["lon"] >= min_lon)
        & (point["lon"] <= max_lon)
        & (point["lat"] >= min_lat)
        & (point["lat"] <= max_lat)
    )


def st_within_polygon(point: Column, ring: Column) -> Column:
    """Ray-casting point-in-polygon over an array<struct<lon,lat>> ring,
    expressed with aggregate() so it runs inside codegen. Counts crossings
    of a horizontal ray; odd -> inside."""
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 2)
    px, py = point["lon"], point["lat"]

    def crossing(i):
        a = F.element_at(ring, i + 1)
        b = F.element_at(ring, i + 2)
        cond = ((a["lat"] > py) != (b["lat"] > py)) & (
            px
            < (b["lon"] - a["lon"]) * (py - a["lat"]) / (b["lat"] - a["lat"])
            + a["lon"]
        )
        return F.when(cond, 1).otherwise(0)

    crossings = F.aggregate(idx, F.lit(0), lambda acc, i: acc + crossing(i))
    return crossings % 2 == 1


def st_polygon_from_text(wkt: Column) -> Column:
    """ST_Polygon / ST_GeomFromText for 'POLYGON ((lon lat, lon lat, ...))'
    (outer ring; the reference's StPolygonFunction parses the same WKT via
    JTS). Pure expression pipeline: extract ring body, split on commas,
    parse each vertex — returns array<struct<lon,lat>> (closed ring)."""
    body = F.regexp_extract(wkt, r"POLYGON\s*\(\s*\(([^)]*)\)\s*\)", 1)
    verts = F.split(body, r"\s*,\s*")
    return F.transform(
        verts,
        lambda v: F.struct(
            F.regexp_extract(F.trim(v), r"^(\S+)\s+(\S+)$", 1)
            .cast("double")
            .alias("lon"),
            F.regexp_extract(F.trim(v), r"^(\S+)\s+(\S+)$", 2)
            .cast("double")
            .alias("lat"),
        ),
    )


def st_contains(ring: Column, point: Column) -> Column:
    """ST_Contains(polygon, point) for simple polygons — the argument
    order of the reference's StContainsFunction; same ray-casting core as
    st_within_polygon (ST_Within(point, polygon) is the converse)."""
    return st_within_polygon(point, ring)


def st_area_spherical(ring: Column) -> Column:
    """ST_Area for a spherical polygon in m² (StAreaFunction geography
    path). Chamberlain–Duquette spherical excess approximation:
    area = R²/2 · |Σ (λ₂−λ₁)(2 + sin φ₁ + sin φ₂)| — trig-only
    expressions, codegen'd, no UDF."""
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 2)

    def term(i):
        a = F.element_at(ring, i + 1)
        b = F.element_at(ring, i + 2)
        return (F.radians(b["lon"]) - F.radians(a["lon"])) * (
            F.lit(2.0) + F.sin(F.radians(a["lat"])) + F.sin(F.radians(b["lat"]))
        )

    s = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + term(i))
    return F.abs(s) * F.lit(EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)


def geo_to_h3(lon: Column, lat: Column, res) -> Column:
    """geoToH3(lon, lat, res) (TransformFunctionType.java:124-146,
    H3IndexFilterOperator.java:262).

    With the `h3` package importable, returns REAL H3 cell ids via an
    Arrow-batched pandas_udf (cross-system compatible — ids match any H3
    implementation). Without it (this container), falls back to the
    hierarchical lat/lon grid of geo_grid_cell: same bucketing contract
    (neighbors share cells, resolution refines) but NOT H3-id compatible
    — documented, and the fallback is detectable via geo_to_h3.is_real_h3.
    """
    try:
        import h3  # noqa: F401

        have_h3 = True
    except ImportError:
        have_h3 = False
    geo_to_h3.is_real_h3 = have_h3
    if not have_h3:
        pt = F.struct(lon.cast("double").alias("lon"), lat.cast("double").alias("lat"))
        return geo_grid_cell(pt, int(res))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _h3_cell(lon_s, lat_s):
        import h3
        import pandas as pd

        return pd.Series(
            [
                int(h3.latlng_to_cell(la, lo, int(res)), 16)
                if la is not None and lo is not None
                else None
                for lo, la in zip(lon_s, lat_s)
            ]
        )

    return _h3_cell(lon.cast("double"), lat.cast("double"))


def st_union_agg(point: Column) -> Column:
    """STUnion aggregate (AggregationFunctionType.java:73; reference impl
    pinot-core/.../aggregation/function/StUnionAggregationFunction.java):
    the union of point geographies is the deduplicated point set — a
    MULTIPOINT. Returned as a deterministically sorted
    array<struct<lon,lat>> so results are stable across partitionings
    (collect_set is order-free; array_sort fixes the order)."""
    return F.array_sort(F.collect_set(point))


def st_union_wkt_agg(wkt: Column) -> Column:
    """STUnion over WKT geometry values — the full-geometry form of the
    aggregate (StUnionAggregationFunction.java:69 unions arbitrary JTS
    geometries; the point-set form above covers geography point columns).
    Supported EXACTLY: points (MULTIPOINT), simple single-ring polygons
    (boundary-walk union with an |A|+|B|-|A∩B| area-identity proof after
    every merge), point+polygon mixes (covered points absorbed), and
    non-crossing linestrings. Anything outside that subset raises
    GeoUnionUnsupported LOUDLY — never a silent coercion
    (functions/geo_union.py documents the limits). Grouped-agg pandas
    UDF: per-group state is the group's geometry list, the same bound
    the reference's accumulating JTS union carries."""
    from hurricanedb_spark.functions.geo_union import union_wkt

    def _union(v):
        return union_wkt(v.tolist())

    agg = F.pandas_udf(_union, "string", F.PandasUDFType.GROUPED_AGG)
    return agg(wkt)


def st_union_as_text(geoms: Column) -> Column:
    """ST_AsText over a point-set union: 'MULTIPOINT (x y, x y, ...)'."""
    parts = F.transform(
        geoms,
        lambda p: F.concat(
            p["lon"].cast("string"), F.lit(" "), p["lat"].cast("string")
        ),
    )
    return F.concat(F.lit("MULTIPOINT ("), F.concat_ws(", ", parts), F.lit(")"))


def geo_grid_cell(point: Column, res: int) -> Column:
    """geoToH3 analog: hierarchical lat/lon grid cell id (expression form of
    functions/registry._geo_to_grid; same contract — neighbors share cells,
    resolution raises precision)."""
    cells = F.lit(2**res)
    y = F.floor((point["lat"] + 90.0) / 180.0 * cells)
    x = F.floor((point["lon"] + 180.0) / 360.0 * cells)
    y = F.least(y, cells - 1).cast("long")
    x = F.least(x, cells - 1).cast("long")
    return (F.lit(res).cast("long") * F.lit(2**40) + y * F.lit(2**20) + x).cast("long")


# --------------------------------------------------------------- WKB layer
# Reference: StGeomFromWKBFunction.java / StAsBinaryFunction.java /
# StGeometryTypeFunction.java (JTS WKBReader/WKBWriter under the hood).
# Here: OGC WKB for the two geometry kinds this module models —
# Point (type 1) <-> struct<lon,lat>, Polygon (type 3, outer ring) <->
# array<struct<lon,lat>>. Parse/emit run as ONE Arrow-batched kernel
# (binary reinterpret has no Spark expression); ST_GeometryType reads only
# the 5-byte header, which IS expressible JVM-side, so it never leaves
# codegen.

WKB_POINT, WKB_POLYGON = 1, 3

_WKB_TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon",
                   4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
                   7: "GeometryCollection"}


def wkb_point_bytes(lon: float, lat: float, little: bool = True) -> bytes:
    """Emit one WKB point (test/write helper)."""
    import struct as _s

    bo = "<" if little else ">"
    return _s.pack(f"{bo}BI", 1 if little else 0, WKB_POINT) + _s.pack(
        f"{bo}2d", lon, lat
    )


def wkb_polygon_bytes(ring: list[tuple[float, float]], little: bool = True) -> bytes:
    import struct as _s

    bo = "<" if little else ">"
    out = _s.pack(f"{bo}BII", 1 if little else 0, WKB_POLYGON, 1)
    out += _s.pack(f"{bo}I", len(ring))
    for lon, lat in ring:
        out += _s.pack(f"{bo}2d", lon, lat)
    return out


def parse_wkb(buf: bytes):
    """Decode one WKB blob -> ('Point', (lon, lat)) or
    ('Polygon', [[(lon, lat), ...] ring0, ...]). Both byte orders."""
    import struct as _s

    if not buf or len(buf) < 5:
        return None
    bo = "<" if buf[0] == 1 else ">"
    (gtype,) = _s.unpack_from(f"{bo}I", buf, 1)
    if gtype == WKB_POINT:
        lon, lat = _s.unpack_from(f"{bo}2d", buf, 5)
        return "Point", (lon, lat)
    if gtype == WKB_POLYGON:
        (nrings,) = _s.unpack_from(f"{bo}I", buf, 5)
        pos = 9
        rings = []
        for _ in range(nrings):
            (npts,) = _s.unpack_from(f"{bo}I", buf, pos)
            pos += 4
            pts = list(
                zip(*[iter(_s.unpack_from(f"{bo}{2 * npts}d", buf, pos))] * 2)
            )
            pos += 16 * npts
            rings.append(pts)
        return "Polygon", rings
    return _WKB_TYPE_NAMES.get(gtype, f"type{gtype}"), None


def st_point_from_wkb(wkb: Column) -> Column:
    """ST_GeomFromWKB for points -> struct<lon,lat> (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("lon double, lat double")
    def _parse(col):
        import pandas as pd

        out = []
        for b in col:
            p = parse_wkb(bytes(b)) if b is not None else None
            out.append(p[1] if p and p[0] == "Point" else (None, None))
        return pd.DataFrame(out, columns=["lon", "lat"])

    return _parse(wkb)


def st_polygon_from_wkb(wkb: Column) -> Column:
    """ST_GeomFromWKB for polygons -> outer ring array<struct<lon,lat>>."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<lon:double,lat:double>>")
    def _parse(col):
        import pandas as pd

        out = []
        for b in col:
            p = parse_wkb(bytes(b)) if b is not None else None
            if p and p[0] == "Polygon" and p[1]:
                out.append([{"lon": x, "lat": y} for x, y in p[1][0]])
            else:
                out.append(None)
        return pd.Series(out)

    return _parse(wkb)


def st_as_wkb(point: Column) -> Column:
    """ST_AsBinary for point geometries (little-endian, matching JTS
    WKBWriter's default)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _emit(col):
        # struct-typed args arrive as a pd.DataFrame with one column per field
        import pandas as pd

        return pd.Series(
            [
                wkb_point_bytes(lon, lat)
                if lon is not None and not pd.isna(lon)
                else None
                for lon, lat in zip(col["lon"], col["lat"])
            ]
        )

    return _emit(point)


def st_polygon_as_wkb(ring: Column) -> Column:
    """ST_AsBinary for polygon geometries (outer ring only)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _emit(col):
        import pandas as pd

        return pd.Series(
            [
                wkb_polygon_bytes([(p["lon"], p["lat"]) for p in r])
                if r is not None
                else None
                for r in col
            ]
        )

    return _emit(ring)


def st_geometry_type_wkb(wkb: Column) -> Column:
    """ST_GeometryType over raw WKB (StGeometryTypeFunction.java:74 returns
    JTS getGeometryType(): 'Point', 'Polygon', ...). Reads the 5-byte
    header with pure expressions — endian byte, then the uint32 type code
    byte-swapped when little-endian — so this stays in codegen; no kernel."""
    hex4 = F.hex(F.substring(wkb, 2, 4))  # 8 hex chars, byte order as stored
    is_le = F.hex(F.substring(wkb, 1, 1)) == "01"
    # type codes are < 256: the low byte is the first stored byte when
    # little-endian, the last when big-endian
    low_byte = F.when(is_le, F.substring(hex4, 1, 2)).otherwise(
        F.substring(hex4, 7, 2)
    )
    code = F.conv(low_byte, 16, 10).cast("int")
    mapping = F.create_map(
        *[x for k, v in _WKB_TYPE_NAMES.items() for x in (F.lit(k), F.lit(v))]
    )
    return mapping[code]


# ----------------------------------------------------------- ST_Equals
# Reference: StEqualsFunction.java (JTS Geometry.equals — topological
# equality). Points: coordinate equality with -0.0/0.0 normalized.
# Polygons: equality of canonicalized rings — drop the closing vertex,
# rotate so the minimum vertex leads, and normalize orientation by taking
# the lexicographically smaller of forward/reversed traversals. All
# higher-order expressions; no kernel, no shuffle.


def st_equals_point(a: Column, b: Column) -> Column:
    az = F.struct((a["lon"] + 0.0).alias("lon"), (a["lat"] + 0.0).alias("lat"))
    bz = F.struct((b["lon"] + 0.0).alias("lon"), (b["lat"] + 0.0).alias("lat"))
    return az == bz


def _min_rotation(arr: Column) -> Column:
    """Lexicographically smallest rotation of `arr`, considering EVERY
    position whose vertex equals the array minimum — a ring whose min
    vertex repeats (a pinch / self-touching ring) has several candidate
    rotations and array_position would pick only the first occurrence,
    which can differ between topologically equal rings."""
    n = F.size(arr)
    mn = F.array_min(arr)
    rots = F.filter(
        F.transform(
            arr,
            lambda x, i: F.when(
                x == mn,
                F.concat(F.slice(arr, i + F.lit(1), n), F.slice(arr, F.lit(1), i)),
            ),
        ),
        lambda r: r.isNotNull(),
    )
    return F.array_min(rots)


def canonical_ring(ring: Column) -> Column:
    """Orientation- and rotation-independent canonical form of a closed
    ring: open the ring, rotate a minimum vertex to the front (all min
    occurrences considered), and take the lexicographically smaller of the
    two directions.

    Expression-only form — valid when `ring` is a native array column.
    Catalyst rejects Python-UDF subtrees inside higher-order lambdas, so
    rings produced by st_polygon_from_wkb/text (pandas UDFs) must go
    through _canonical_ring_kernel instead (st_equals_polygon does)."""
    opened = F.slice(ring, 1, F.size(ring) - 1)  # drop closing vertex
    return F.least(_min_rotation(opened), _min_rotation(F.reverse(opened)))


def _canonical_ring_kernel() -> Column:
    """Arrow-batched canonical-ring kernel: same semantics as
    canonical_ring (all min-vertex occurrences considered in both
    directions — a pinch ring whose minimum vertex repeats canonicalizes
    identically regardless of traversal), usable on UDF-parsed rings."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<lon:double,lat:double>>")
    def _canon(col):
        def canon(ring):
            if ring is None:
                return None
            pts = [(p["lon"] + 0.0, p["lat"] + 0.0) for p in ring]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]  # drop closing vertex
            best = None
            for seq in (pts, pts[::-1]):
                if not seq:
                    continue
                mn = min(seq)
                for i, v in enumerate(seq):
                    if v == mn:
                        rot = seq[i:] + seq[:i]
                        if best is None or rot < best:
                            best = rot
            return (
                [{"lon": x, "lat": y} for x, y in best] if best is not None else []
            )

        return col.apply(canon)

    return _canon


def st_equals_polygon(a: Column, b: Column) -> Column:
    canon = _canonical_ring_kernel()
    return canon(a) == canon(b)


def st_polygon_as_text(ring: Column) -> Column:
    """ST_AsText for polygon geometries (outer ring) — the emit side of
    st_polygon_from_text (StAsTextFunction covers every geometry type via
    JTS WKTWriter; here the two types this module models round-trip)."""
    verts = F.transform(
        ring,
        lambda p: F.concat(
            p["lon"].cast("string"), F.lit(" "), p["lat"].cast("string")
        ),
    )
    return F.concat(F.lit("POLYGON (("), F.concat_ws(", ", verts), F.lit("))"))
