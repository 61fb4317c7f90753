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


def wkt_polygon_ring(wkt: Column) -> Column:
    """Outer ring of a `POLYGON ((...))` WKT string as
    `array<array<double>>` — the inverse of `ring_to_wkt`. See
    `wkt_polygon_rings` for the all-rings (holes included) variant.
    Unparseable strings yield an empty array (callers filter on size)."""
    # anchored: MULTIPOLYGON contains the substring POLYGON and must NOT
    # half-match (its second polygon would otherwise parse as a hole)
    inner = F.regexp_extract(wkt, r"^\s*POLYGON\s*(?:ZM|Z|M)?\s*\(\(([^)]*)\)\)", 1)
    pts = F.split(inner, r"\s*,\s*")
    parsed = F.transform(
        pts,
        # slice to lon/lat: POLYGON Z / M variants carry extra ordinates
        lambda s: F.slice(
            F.transform(F.split(F.trim(s), r"\s+"), lambda t: t.cast("double")),
            1,
            2,
        ),
    )
    return F.when(F.length(inner) == 0, F.array().cast("array<array<double>>")).otherwise(
        parsed
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


def cell_to_boundary_wkt(cell: Column, precision: int = 7) -> Column:
    """WKT boundary straight from a cell-id column (composes the Arrow
    boundary UDF with the Catalyst serializer)."""
    from a5spark.functions.udfs import a5_cell_to_boundary

    return ring_to_wkt(a5_cell_to_boundary(cell), precision)


def cell_to_boundary_geojson(cell: Column, precision: int = 7) -> Column:
    from a5spark.functions.udfs import a5_cell_to_boundary

    return ring_to_geojson(a5_cell_to_boundary(cell), precision)


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
