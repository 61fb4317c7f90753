"""WKT / GeoJSON interop for A5 cell boundaries — the GIS export surface.

The reference exposes boundaries as raw coordinate arrays
(`cell_to_boundary`, /root/reference/a5/core/cell.py); everything a user
plugs those into (PostGIS, QGIS, Sedona, DuckDB-spatial, deck.gl) speaks
WKT or GeoJSON. These builders are pure Catalyst string expressions over
the boundary `array<array<double>>` column — no Python row path, so export
runs JVM-side inside whole-stage codegen at scan speed.

Float-formatting caveat, and why there are two WKT builders: decimal
rendering of doubles is engine-specific at round-half ties (Java Formatter
%.Nf rounds HALF_UP on the exact binary expansion; C printf rounds
half-even), so `ring_to_wkt` output is for GIS consumers, not for
cross-engine hashing. `ring_to_wkt_fixed` renders integer 10^-scale
degrees via truncation (`CAST(x*10^s AS BIGINT)` toward zero — exact and
identical in Spark and DuckDB), which is what the `boundary_wkt` oracle
query hashes.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F


def ring_to_wkt(ring: Column, precision: int = 7) -> Column:
    """`POLYGON ((lon lat, ...))` from a closed lonlat ring; `POLYGON EMPTY`
    for degenerate (<4 point) rings, matching WKT's closed-ring minimum."""
    fmt = f"%.{precision}f %.{precision}f"
    pts = F.transform(ring, lambda p: F.format_string(fmt, p[0], p[1]))
    return F.when(
        F.coalesce(F.size(ring), F.lit(0)) < 4, F.lit("POLYGON EMPTY")
    ).otherwise(
        F.concat(F.lit("POLYGON (("), F.array_join(pts, ", "), F.lit("))"))
    )


def ring_to_wkt_fixed(ring: Column, scale: int = 7) -> Column:
    """Fixed-point WKT: coordinates as integer 10^-`scale` degrees obtained
    by truncation toward zero — bit-identical across engines (see module
    docstring), so safe to value-hash in cross-engine oracles."""
    mult = F.lit(float(10**scale))
    pts = F.transform(
        ring,
        lambda p: F.concat_ws(
            " ",
            (p[0] * mult).cast("long").cast("string"),
            (p[1] * mult).cast("long").cast("string"),
        ),
    )
    return F.when(
        F.coalesce(F.size(ring), F.lit(0)) < 4, F.lit("POLYGON EMPTY")
    ).otherwise(
        F.concat(F.lit("POLYGON (("), F.array_join(pts, ", "), F.lit("))"))
    )


def ring_to_geojson(ring: Column, precision: int = 7) -> Column:
    """GeoJSON `Polygon` geometry string (single outer ring — A5 cell
    boundaries have no holes)."""
    fmt = f"[%.{precision}f,%.{precision}f]"
    pts = F.transform(ring, lambda p: F.format_string(fmt, p[0], p[1]))
    return F.concat(
        F.lit('{"type":"Polygon","coordinates":[['),
        F.array_join(pts, ","),
        F.lit("]]}"),
    )


def rings_to_multipolygon_wkt(rings: Column, precision: int = 7) -> Column:
    """`MULTIPOLYGON (((...)), ((...)))` from an `array<array<array<double>>>`
    of closed lonlat rings — one single-ring polygon part per ring (A5 cell
    boundaries have no holes, so a cell cover's parts are exactly its cell
    rings). Rings shorter than WKT's 4-point closed-ring minimum are
    dropped; no valid ring yields `MULTIPOLYGON EMPTY`. Pure Catalyst, like
    the POLYGON builders (see module docstring for the float-format
    caveat; use the _fixed variant for cross-engine hashing)."""
    fmt = f"%.{precision}f %.{precision}f"
    kept = F.filter(rings, lambda ring: F.size(ring) >= 4)
    parts = F.transform(
        kept,
        lambda ring: F.concat(
            F.lit("(("),
            F.array_join(
                F.transform(ring, lambda p: F.format_string(fmt, p[0], p[1])),
                ", ",
            ),
            F.lit("))"),
        ),
    )
    return F.when(
        F.coalesce(F.size(kept), F.lit(0)) == 0, F.lit("MULTIPOLYGON EMPTY")
    ).otherwise(
        F.concat(F.lit("MULTIPOLYGON ("), F.array_join(parts, ", "), F.lit(")"))
    )


def rings_to_multipolygon_wkt_fixed(rings: Column, scale: int = 7) -> Column:
    """Fixed-point MULTIPOLYGON (truncation-exact integer 10^-scale degrees
    — bit-identical across engines, safe to value-hash; see
    `ring_to_wkt_fixed`)."""
    mult = F.lit(float(10**scale))
    kept = F.filter(rings, lambda ring: F.size(ring) >= 4)
    parts = F.transform(
        kept,
        lambda ring: F.concat(
            F.lit("(("),
            F.array_join(
                F.transform(
                    ring,
                    lambda p: F.concat_ws(
                        " ",
                        (p[0] * mult).cast("long").cast("string"),
                        (p[1] * mult).cast("long").cast("string"),
                    ),
                ),
                ", ",
            ),
            F.lit("))"),
        ),
    )
    return F.when(
        F.coalesce(F.size(kept), F.lit(0)) == 0, F.lit("MULTIPOLYGON EMPTY")
    ).otherwise(
        F.concat(F.lit("MULTIPOLYGON ("), F.array_join(parts, ", "), F.lit(")"))
    )


def rings_to_multipolygon_geojson(rings: Column, precision: int = 7) -> Column:
    """GeoJSON `MultiPolygon` geometry string from an
    `array<array<array<double>>>` of closed lonlat rings — one single-ring
    polygon part per ring, mirroring `rings_to_multipolygon_wkt`. Rings
    under 4 points are dropped; none left yields empty coordinates
    (`{"type":"MultiPolygon","coordinates":[]}`, the GeoJSON empty form)."""
    fmt = f"[%.{precision}f,%.{precision}f]"
    kept = F.filter(rings, lambda ring: F.size(ring) >= 4)
    parts = F.transform(
        kept,
        lambda ring: F.concat(
            F.lit("[["),
            F.array_join(
                F.transform(ring, lambda p: F.format_string(fmt, p[0], p[1])),
                ",",
            ),
            F.lit("]]"),
        ),
    )
    return F.concat(
        F.lit('{"type":"MultiPolygon","coordinates":['),
        F.array_join(parts, ","),
        F.lit("]}"),
    )


def wkt_polygon_ring(wkt: Column) -> Column:
    """Outer ring of a `POLYGON ((...))` WKT string as
    `array<array<double>>` — the inverse of `ring_to_wkt`. Derived from the
    holes-aware `wkt_polygon_rings` parser so holed polygons keep their
    outer ring (a `((...))`-only regex would reject them). Unparseable and
    non-POLYGON strings yield an empty array (callers filter on size)."""
    return F.coalesce(
        F.get(wkt_polygon_rings(wkt), 0),
        F.array().cast("array<array<double>>"),
    )


def wkt_polygon_rings(wkt: Column) -> Column:
    """ALL rings of a `POLYGON ((outer), (hole), ...)` WKT string as
    `array<array<array<double>>>` (outer ring first, then holes) — the
    shape `operators.polygons.polyfill_cover` consumes as JSON. Rings
    shorter than 3 points (including parse failures) are dropped;
    non-POLYGON strings yield an empty array."""
    # anchored — see wkt_polygon_ring: MULTIPOLYGON must not half-match
    body = F.regexp_extract(wkt, r"^\s*POLYGON\s*(?:ZM|Z|M)?\s*\((.*)\)\s*$", 1)
    raw_rings = F.split(body, r"\)\s*,\s*\(")
    parsed = F.transform(
        raw_rings,
        lambda ring: F.transform(
            F.split(F.regexp_replace(ring, r"[()]", ""), r"\s*,\s*"),
            # slice to lon/lat: POLYGON Z / M variants carry extra ordinates
            lambda s: F.slice(
                F.transform(
                    F.split(F.trim(s), r"\s+"), lambda t: t.cast("double")
                ),
                1,
                2,
            ),
        ),
    )
    kept = F.filter(parsed, lambda ring: F.size(ring) >= 3)
    return F.when(
        F.length(body) == 0, F.array().cast("array<array<array<double>>>")
    ).otherwise(kept)


def cell_to_boundary_wkt(
    cell: Column, precision: int = 7, segments=None
) -> Column:
    """WKT boundary straight from a cell-id column (composes the Arrow
    boundary UDF with the Catalyst serializer). `segments` densifies each
    pentagon edge (None/'auto' = the resolution default 2^(6-res)); rings
    stay closed — WKT requires it."""
    from a5spark.functions.udfs import (
        a5_cell_to_boundary,
        a5_cell_to_boundary_opts,
    )

    udf = (
        a5_cell_to_boundary
        if segments in (None, "auto")
        else a5_cell_to_boundary_opts(segments=segments)
    )
    return ring_to_wkt(udf(cell), precision)


def cell_to_boundary_geojson(
    cell: Column, precision: int = 7, segments=None
) -> Column:
    from a5spark.functions.udfs import (
        a5_cell_to_boundary,
        a5_cell_to_boundary_opts,
    )

    udf = (
        a5_cell_to_boundary
        if segments in (None, "auto")
        else a5_cell_to_boundary_opts(segments=segments)
    )
    return ring_to_geojson(udf(cell), precision)


def geojson_polygon_rings(geojson: Column) -> Column:
    """ALL rings of a GeoJSON `Polygon` geometry string as
    `array<array<array<double>>>` (outer ring first, then holes) — the
    inverse of `ring_to_geojson` and the second common interchange shape
    next to WKT. Parsed with from_json against the GeoJSON Polygon schema;
    non-Polygon types and malformed JSON yield an empty array."""
    schema = "type STRING, coordinates ARRAY<ARRAY<ARRAY<DOUBLE>>>"
    g = F.from_json(geojson, schema)
    return F.when(
        g["type"] == "Polygon", F.coalesce(g["coordinates"], F.array())
    ).otherwise(F.array().cast("array<array<array<double>>>"))


# A WKT ring list: `((ring), (ring), ...)` — one polygon part's parenthesized
# rings (outer first, then holes). Ring bodies carry no nested parens, so the
# bounded-depth pattern is exact; it is both the part extractor INSIDE a
# MULTIPOLYGON body and the whole body OF a POLYGON.
_WKT_RING_LIST = r"\(\s*\([^()]*\)(?:\s*,\s*\([^()]*\))*\s*\)"

# A polygonal WKT geometry anywhere in a string. MULTIPOLYGON first: it
# contains the substring POLYGON, and alternation must consume the whole
# multi-geometry before the bare-POLYGON branch could half-match inside it.
# Both keywords are \b-anchored and the bare branch carries a (?<!MULTI)
# guard, so (a) a malformed MULTIPOLYGON whose body fails the first branch
# yields NO parts instead of half-parsing its embedded 'POLYGON' substring
# as a bare polygon, and (b) tokens like 'XPOLYGON ((...))' never parse as
# polygonal (the scanner starts only at a real keyword boundary).
_WKT_POLYGONAL_GEOM = (
    r"(?:\bMULTIPOLYGON\s*(?:ZM|Z|M)?\s*\(\s*"
    + _WKT_RING_LIST
    + r"(?:\s*,\s*"
    + _WKT_RING_LIST
    + r")*\s*\))|(?:(?<!MULTI)\bPOLYGON\s*(?:ZM|Z|M)?\s*"
    + _WKT_RING_LIST
    + r")"
)

_PARTS_TYPE = "array<array<array<array<double>>>>"


def _parse_ring_list(part: Column) -> Column:
    """`((r1), (r2), ...)` string -> `array<array<array<double>>>` rings.
    Rings shorter than 3 points are dropped; Z/M extra ordinates sliced."""
    body = F.regexp_replace(part, r"^\s*\(|\)\s*$", "")
    raw_rings = F.split(body, r"\)\s*,\s*\(")
    parsed = F.transform(
        raw_rings,
        lambda ring: F.transform(
            F.split(F.regexp_replace(ring, r"[()]", ""), r"\s*,\s*"),
            lambda s: F.slice(
                F.transform(
                    F.split(F.trim(s), r"\s+"), lambda t: t.cast("double")
                ),
                1,
                2,
            ),
        ),
    )
    return F.filter(parsed, lambda ring: F.size(ring) >= 3)


def wkt_polygon_parts(wkt: Column) -> Column:
    """Every polygonal part of a WKT geometry as
    `array<array<array<array<double>>>>` — one element per polygon part,
    each a rings array (outer ring first, then holes) in the shape
    `wkt_polygon_rings` produces for a single POLYGON.

    Accepts POLYGON (one part), MULTIPOLYGON (one part per member), and
    GEOMETRYCOLLECTION (polygonal members extracted; points/lines ignored
    — the scan is keyword-anchored, so MULTILINESTRING/MULTIPOINT ring
    lists cannot false-match). Strings with no polygonal geometry yield an
    empty array. Two-stage pure-Catalyst parse: extract polygonal
    geometries, then extract each geometry's `((...))` ring lists —
    bounded paren depth makes both regexes exact (no balanced-nesting
    heuristics). Parts with no valid (>=3 point) ring are dropped.

    A part — one outer ring plus holes — is exactly the unit the fill
    kernel consumes (reference ring handling:
    /root/reference/a5/regions/polygon.py:224-263; the reference has no
    WKT surface, so the multi-part semantics here are defined as the
    UNION of per-part fills, parity-tested on its country fixtures)."""
    geoms = F.regexp_extract_all(wkt, F.lit(_WKT_POLYGONAL_GEOM), 0)
    parts = F.flatten(
        F.transform(
            geoms, lambda g: F.regexp_extract_all(g, F.lit(_WKT_RING_LIST), 0)
        )
    )
    parsed = F.transform(parts, _parse_ring_list)
    return F.filter(
        F.coalesce(parsed, F.array().cast(_PARTS_TYPE)),
        lambda rings: F.size(rings) >= 1,
    )


def geojson_polygon_parts(geojson: Column) -> Column:
    """Every polygonal part of a GeoJSON geometry string as
    `array<array<array<array<double>>>>` (same part shape as
    `wkt_polygon_parts`). Accepts Polygon, MultiPolygon, and
    GeometryCollection with polygonal members — including collections that
    MIX Polygon and MultiPolygon members: the string is parsed once per
    coordinate depth and from_json's PERMISSIVE mode nulls only the
    mismatched `coordinates` field per element, so each pass keeps exactly
    its own member type. Collection parts are ordered Polygon members
    first, then MultiPolygon members flattened (set-semantics consumers —
    polyfill union — are order-insensitive). Nested GeometryCollections
    and non-polygonal types yield no parts; malformed JSON yields an empty
    array."""
    poly = F.from_json(
        geojson, "type STRING, coordinates ARRAY<ARRAY<ARRAY<DOUBLE>>>"
    )
    mpoly = F.from_json(
        geojson, "type STRING, coordinates ARRAY<ARRAY<ARRAY<ARRAY<DOUBLE>>>>"
    )
    gc_poly = F.from_json(
        geojson,
        "type STRING, geometries ARRAY<STRUCT<type: STRING,"
        " coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>>>",
    )
    gc_mpoly = F.from_json(
        geojson,
        "type STRING, geometries ARRAY<STRUCT<type: STRING,"
        " coordinates: ARRAY<ARRAY<ARRAY<ARRAY<DOUBLE>>>>>>",
    )
    empty = F.array().cast(_PARTS_TYPE)

    def _members(gc: Column, want: str) -> Column:
        kept = F.filter(
            F.coalesce(gc["geometries"], F.array()),
            lambda g: (g["type"] == want) & g["coordinates"].isNotNull(),
        )
        return F.transform(kept, lambda g: g["coordinates"])

    collected = F.concat(
        _members(gc_poly, "Polygon"),
        F.flatten(_members(gc_mpoly, "MultiPolygon")),
    )
    return (
        F.when(
            (poly["type"] == "Polygon") & poly["coordinates"].isNotNull(),
            F.array(poly["coordinates"]),
        )
        .when(
            (mpoly["type"] == "MultiPolygon") & mpoly["coordinates"].isNotNull(),
            mpoly["coordinates"],
        )
        .when(poly["type"] == "GeometryCollection", collected)
        .otherwise(empty)
    )
