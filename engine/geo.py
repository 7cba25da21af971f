"""ES geo query/agg family over point columns.

Implements the Elasticsearch geo surface the engine was missing —
``geo_bounding_box`` / ``geo_distance`` queries, the ``geo_distance``
(ring) aggregation, ``geohash_grid`` / ``geotile_grid`` bucket
aggregations and the ``geo_bounds`` / ``geo_centroid`` metric
aggregations (reference scope: the Lucene searcher the reference repo
wraps delegates these to Lucene's LatLonPoint queries; the agg
definitions follow the public ES docs).

The synthetic ``events`` table carries no coordinates, so points
derive deterministically from ``event_id`` via integer modular
arithmetic — bit-identical in any engine, no randomness:

    lat = ((event_id * 7919)   % 180000) / 1000.0 -  90.0
    lon = ((event_id * 104729) % 360000) / 1000.0 - 180.0

Cross-engine determinism rules (CLAUDE.md float recipe):

* geohash / bounding box are pure IEEE arithmetic + integer bit ops —
  exact on both engines, no rounding needed;
* haversine uses libm (sin/cos/asin) whose last ulp may differ between
  the JVM and DuckDB — every distance is rounded HALF_UP to 3 dp
  (meter grain) before any filter, bucket edge, or rank;
* geotile's mercator y uses ln/tan — the mercator fraction is rounded
  HALF_UP to 9 dp before the tile floor;
* ring/centroid averages quantize each addend to int64 micro-units and
  accumulate integers (sum-order ulps cannot flip a rounding boundary).

Every builder here has a twin SQL-string form so the DuckDB oracles
share the exact operation order with the Spark plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.portable import round_half_up, round_half_up_sql

# pinned literals shared by both engines (never call pi() / radians())
PI = 3.141592653589793
DEG = 0.017453292519943295          # pi / 180
EARTH_RADIUS_KM = 6371.0088         # IUGG mean Earth radius
MERCATOR_MAX_LAT = 85.05112878      # web-mercator clamp

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

_LAT_EXPR = "(((event_id * 7919) % 180000) / 1000.0 - 90.0)"
_LON_EXPR = "(((event_id * 104729) % 360000) / 1000.0 - 180.0)"


# ---------------------------------------------------------------------------
# Derived point columns
# ---------------------------------------------------------------------------

def with_geo(events: DataFrame) -> DataFrame:
    """Attach the deterministic (lat, lon) point to each event."""
    lat = (F.col("event_id") * F.lit(7919)) % F.lit(180000) / F.lit(1000.0) - F.lit(90.0)
    lon = (F.col("event_id") * F.lit(104729)) % F.lit(360000) / F.lit(1000.0) - F.lit(180.0)
    return events.withColumn("lat", lat).withColumn("lon", lon)


def geo_sql_cte(table: str = "events") -> str:
    """DuckDB CTE body mirroring :func:`with_geo`'s expressions."""
    return (f"SELECT *, {_LAT_EXPR} AS lat, {_LON_EXPR} AS lon "
            f"FROM {table}")


# integer MILLIDEGREE twins of the point columns: lat_m = 1000*lat,
# lon_m = 1000*lon, but derived directly from the modular arithmetic
# so they are int64 end-to-end (the polygon ray cast and the geo_line
# point lists below never touch a float at all)
_LAT_M_EXPR = "(((event_id * 7919) % 180000) - 90000)"
_LON_M_EXPR = "(((event_id * 104729) % 360000) - 180000)"


def with_geo_m(events: DataFrame) -> DataFrame:
    """Attach the deterministic point in integer millidegrees."""
    lat_m = ((F.col("event_id") * F.lit(7919)) % F.lit(180000)
             - F.lit(90000)).cast("long")
    lon_m = ((F.col("event_id") * F.lit(104729)) % F.lit(360000)
             - F.lit(180000)).cast("long")
    return events.withColumn("lat_m", lat_m).withColumn("lon_m", lon_m)


def geo_m_sql_cte(table: str = "events") -> str:
    """DuckDB CTE body mirroring :func:`with_geo_m`'s expressions."""
    return (f"SELECT *, {_LAT_M_EXPR} AS lat_m, {_LON_M_EXPR} AS lon_m "
            f"FROM {table}")


# ---------------------------------------------------------------------------
# Haversine distance (km)
# ---------------------------------------------------------------------------

def haversine_km(lat: Column, lon: Column, lat0: float, lon0: float) -> Column:
    """Great-circle distance to a fixed point, UNROUNDED km."""
    phi1 = lat * F.lit(DEG)
    phi0 = F.lit(lat0 * DEG)
    dphi = (lat - F.lit(lat0)) * F.lit(DEG)
    dlam = (lon - F.lit(lon0)) * F.lit(DEG)
    a = (F.sin(dphi / F.lit(2.0)) * F.sin(dphi / F.lit(2.0))
         + F.cos(phi1) * F.cos(phi0)
         * F.sin(dlam / F.lit(2.0)) * F.sin(dlam / F.lit(2.0)))
    a = F.least(a, F.lit(1.0))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _d(x: float) -> str:
    """A float constant as an explicitly-DOUBLE SQL literal: DuckDB
    parses long decimal expansions as DECIMAL, whose fixed-point
    arithmetic overflows on expressions like tiny + 180.0 — every
    embedded constant (and any literal a caller passes) must be a
    DOUBLE for the twin to mirror Spark's float math."""
    return f"CAST({x!r} AS DOUBLE)"


def haversine_km_sql(lat: str, lon: str, lat0: float, lon0: float) -> str:
    """DuckDB twin of :func:`haversine_km` — same op order."""
    phi1 = f"(({lat}) * {_d(DEG)})"
    phi0 = _d(lat0 * DEG)
    dphi = f"((({lat}) - {_d(lat0)}) * {_d(DEG)})"
    dlam = f"((({lon}) - {_d(lon0)}) * {_d(DEG)})"
    a = (f"(sin({dphi} / 2.0) * sin({dphi} / 2.0) "
         f"+ cos({phi1}) * cos({phi0}) "
         f"* sin({dlam} / 2.0) * sin({dlam} / 2.0))")
    return f"(2.0 * {_d(EARTH_RADIUS_KM)} * asin(sqrt(least({a}, 1.0))))"


# ---------------------------------------------------------------------------
# Geohash (5·p bits: ceil(5p/2) lon + floor(5p/2) lat, interleaved
# lon-first from the MSB — the standard public encoding)
# ---------------------------------------------------------------------------

def _geohash_dims(precision: int) -> tuple[int, int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2
    return total, lon_bits, total - lon_bits


def geohash(lat: Column, lon: Column, precision: int = 5) -> Column:
    """Standard base-32 geohash — pure integer bit interleave on the
    quantized cell indices, exact in any engine (32-bit-safe shifts:
    precision ≤ 12 keeps every shift < 60, CLAUDE.md bitwise rule)."""
    total, lon_bits, lat_bits = _geohash_dims(precision)
    lon_q = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                * F.lit(float(1 << lon_bits)))
        .cast("long"), F.lit((1 << lon_bits) - 1).cast("long"))
    lat_q = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                * F.lit(float(1 << lat_bits)))
        .cast("long"), F.lit((1 << lat_bits) - 1).cast("long"))
    combined = F.lit(0).cast("long")
    for j in range(total):   # bit j from the MSB: even→lon, odd→lat
        src, src_bits = (lon_q, lon_bits) if j % 2 == 0 else (lat_q, lat_bits)
        combined = combined + F.shiftleft(
            F.shiftright(src, src_bits - 1 - j // 2).bitwiseAND(F.lit(1)),
            total - 1 - j)
    chars = []
    for c in range(precision):
        idx = F.shiftright(combined, total - 5 * (c + 1)).bitwiseAND(F.lit(31))
        chars.append(F.substring(F.lit(GEOHASH_ALPHABET),
                                 (idx + F.lit(1)).cast("int"), F.lit(1)))
    return F.concat(*chars)


def geohash_sql(lat: str, lon: str, precision: int = 5) -> str:
    """DuckDB twin of :func:`geohash`."""
    total, lon_bits, lat_bits = _geohash_dims(precision)
    lon_q = (f"least(CAST(floor((({lon}) + 180.0) / 360.0 * "
             f"{_d(float(1 << lon_bits))}) AS BIGINT), "
             f"{(1 << lon_bits) - 1})")
    lat_q = (f"least(CAST(floor((({lat}) + 90.0) / 180.0 * "
             f"{_d(float(1 << lat_bits))}) AS BIGINT), "
             f"{(1 << lat_bits) - 1})")
    terms = []
    for j in range(total):
        src, src_bits = (lon_q, lon_bits) if j % 2 == 0 else (lat_q, lat_bits)
        terms.append(f"((({src} >> {src_bits - 1 - j // 2}) & 1) "
                     f"<< {total - 1 - j})")
    combined = "(" + " + ".join(terms) + ")"
    chars = [(f"substring('{GEOHASH_ALPHABET}', "
              f"CAST((({combined} >> {total - 5 * (c + 1)}) & 31) + 1 "
              f"AS INT), 1)")
             for c in range(precision)]
    return "(" + " || ".join(chars) + ")"


# ---------------------------------------------------------------------------
# Geotile (web-mercator z/x/y, ES geotile_grid key format)
# ---------------------------------------------------------------------------

def geotile(lat: Column, lon: Column, zoom: int) -> Column:
    """ES geotile_grid cell key ``"z/x/y"``; mercator fraction rounded
    to 9 dp before the tile floor (libm ln/tan cross-engine guard)."""
    n = float(1 << zoom)
    x = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long"),
        F.lit(int(n) - 1).cast("long"))
    latc = F.greatest(F.least(lat, F.lit(MERCATOR_MAX_LAT)),
                      F.lit(-MERCATOR_MAX_LAT))
    phi = latc * F.lit(DEG)
    merc = (F.lit(1.0)
            - F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi)) / F.lit(PI)) / F.lit(2.0)
    y = F.greatest(
        F.least(F.floor(round_half_up(merc, 9) * F.lit(n)).cast("long"),
                F.lit(int(n) - 1).cast("long")),
        F.lit(0).cast("long"))
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"),
                       y.cast("string"))


def geotile_sql(lat: str, lon: str, zoom: int) -> str:
    """DuckDB twin of :func:`geotile`."""
    n = float(1 << zoom)
    x = (f"least(CAST(floor((({lon}) + 180.0) / 360.0 * {_d(n)}) "
         f"AS BIGINT), {int(n) - 1})")
    latc = (f"greatest(least(({lat}), {_d(MERCATOR_MAX_LAT)}), "
            f"{_d(-MERCATOR_MAX_LAT)})")
    phi = f"({latc} * {_d(DEG)})"
    merc = f"((1.0 - ln(tan({phi}) + 1.0 / cos({phi})) / {_d(PI)}) / 2.0)"
    y = (f"greatest(least(CAST(floor({round_half_up_sql(merc, 9)} * {_d(n)}) "
         f"AS BIGINT), {int(n) - 1}), 0)")
    return (f"('{zoom}' || '/' || CAST({x} AS VARCHAR) || '/' || "
            f"CAST({y} AS VARCHAR))")


# ---------------------------------------------------------------------------
# Query / agg surfaces (DataFrame side)
# ---------------------------------------------------------------------------

def geo_bounding_box(events: DataFrame, *, top: float, bottom: float,
                     left: float, right: float) -> DataFrame:
    """ES geo_bounding_box query: pure comparison filter (exact)."""
    g = with_geo(events)
    return g.where((F.col("lat") <= F.lit(top))
                   & (F.col("lat") >= F.lit(bottom))
                   & (F.col("lon") >= F.lit(left))
                   & (F.col("lon") <= F.lit(right)))


def geo_distance_query(events: DataFrame, lat0: float, lon0: float,
                       radius_km: float, k: int) -> DataFrame:
    """ES geo_distance query + _geo_distance sort: k nearest events
    inside the radius, ranked by the ROUNDED distance (3 dp), id asc."""
    from pyspark.sql import Window

    g = with_geo(events)
    dist = round_half_up(
        haversine_km(F.col("lat"), F.col("lon"), lat0, lon0), 3)
    g = g.withColumn("dist_km", dist).where(F.col("dist_km") <= F.lit(radius_km))
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    # heap + driver merge of k rows — no single-partition shuffle of
    # the whole matched set); the rank window then runs over k rows.
    top = g.orderBy(F.asc("dist_km"), F.asc("event_id")).limit(k)
    w = Window.orderBy(F.asc("dist_km"), F.asc("event_id"))
    return top.withColumn("rank", F.row_number().over(w))


def geo_distance_rings(events: DataFrame, lat0: float, lon0: float,
                       edges: list[float]) -> DataFrame:
    """ES geo_distance aggregation: ring buckets [e0,e1), [e1,e2), …,
    [en,inf) over the rounded distance; count + micro-unit-exact mean
    of ``value`` per ring."""
    g = with_geo(events)
    dist = round_half_up(
        haversine_km(F.col("lat"), F.col("lon"), lat0, lon0), 3)
    g = g.withColumn("dist_km", dist)
    ring = F.lit(f"{edges[-1]:g}-*")
    for lo, hi in zip(edges[-2::-1], edges[:0:-1]):
        ring = F.when((F.col("dist_km") >= F.lit(lo))
                      & (F.col("dist_km") < F.lit(hi)),
                      F.lit(f"{lo:g}-{hi:g}")).otherwise(ring)
    ring = F.when(F.col("dist_km") < F.lit(edges[0]), None).otherwise(ring)
    v_mu = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (g.withColumn("ring", ring).where(F.col("ring").isNotNull())
            .groupBy("ring")
            .agg(F.count(F.lit(1)).alias("n"),
                 round_half_up(F.sum(v_mu) / F.count(F.lit(1)) / F.lit(1e6),
                               4).alias("avg_value")))


def geohash_grid(events: DataFrame, top_n: int,
                 precision: int = 5) -> DataFrame:
    """ES geohash_grid aggregation: doc count per cell, top-N cells by
    (count desc, cell asc) — all-integer, exact."""
    from pyspark.sql import Window

    g = with_geo(events)
    cells = (g.withColumn("cell", geohash(F.col("lat"), F.col("lon"),
                                          precision))
             .groupBy("cell").agg(F.count(F.lit(1)).alias("n")))
    # occupied cells can rival the corpus at high precision — take the
    # top-N with TakeOrderedAndProject, then rank the N survivors.
    top = cells.orderBy(F.desc("n"), F.asc("cell")).limit(top_n)
    w = Window.orderBy(F.desc("n"), F.asc("cell"))
    return top.withColumn("rank", F.row_number().over(w))


def geotile_grid(events: DataFrame, zoom: int) -> DataFrame:
    """ES geotile_grid aggregation: doc count per z/x/y cell."""
    g = with_geo(events)
    return (g.withColumn("cell", geotile(F.col("lat"), F.col("lon"), zoom))
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n")))


def _polygon_edges(vertices_m: list[tuple[int, int]]):
    """Non-horizontal edges of a closed integer-millidegree polygon
    as ((x1, y1), (x2, y2)) pairs; horizontal edges never straddle
    the ray-cast scanline so they contribute no crossing."""
    n = len(vertices_m)
    assert n >= 3, "polygon needs at least 3 vertices"
    out = []
    for i in range(n):
        x1, y1 = vertices_m[i]
        x2, y2 = vertices_m[(i + 1) % n]
        if y1 != y2:
            out.append(((x1, y1), (x2, y2)))
    return out


def point_in_polygon_m(lat_m: Column, lon_m: Column,
                       vertices_m: list[tuple[int, int]]) -> Column:
    """Even-odd ray cast entirely in int64: a rightward horizontal ray
    from (lon_m, lat_m) crosses edge (x1,y1)-(x2,y2) iff the edge
    straddles the scanline (y1>y != y2>y — half-open, so a shared
    vertex counts once) and the point sits strictly left of the edge,
    tested via the integer cross product (x2-x1)(y-y1)-(x-x1)(y2-y1)
    whose required sign is the sign of y2-y1 — a CODEGEN-TIME constant
    per edge. Coordinates are millidegrees (<4e5), so every product is
    < 2^40: exact int64, bit-identical cross-engine (no division, no
    floats — the CLAUDE.md bitwise rule). Non-convex polygons are the
    point of the parity rule and are exercised by the dart fixture."""
    crossings = F.lit(0)
    for (x1, y1), (x2, y2) in _polygon_edges(vertices_m):
        straddle = (F.lit(y1) > lat_m) != (F.lit(y2) > lat_m)
        cross = (F.lit(x2 - x1) * (lat_m - F.lit(y1))
                 - (lon_m - F.lit(x1)) * F.lit(y2 - y1))
        left = cross > F.lit(0) if y2 > y1 else cross < F.lit(0)
        crossings = crossings + F.when(straddle & left, 1).otherwise(0)
    return crossings % F.lit(2) == F.lit(1)


def point_in_polygon_m_sql(lat_m: str, lon_m: str,
                           vertices_m: list[tuple[int, int]]) -> str:
    """DuckDB twin of :func:`point_in_polygon_m` — generated from the
    same edge list, same per-edge sign constants. Every constant is
    emitted as an explicit BIGINT: bare integer literals parse as
    INT32 and the cross products overflow them (property-test find,
    same class as the DOUBLE-literal rule in :func:`_d`). A polygon
    with no non-horizontal edge has no interior under the parity
    rule — emitted as FALSE (an empty sum would not parse)."""
    def _b(v: int) -> str:
        return f"CAST({v} AS BIGINT)"

    terms = []
    for (x1, y1), (x2, y2) in _polygon_edges(vertices_m):
        straddle = f"(({y1} > ({lat_m})) != ({y2} > ({lat_m})))"
        cross = (f"({_b(x2 - x1)} * (({lat_m}) - {_b(y1)}) "
                 f"- (({lon_m}) - {_b(x1)}) * {_b(y2 - y1)})")
        left = f"({cross} > 0)" if y2 > y1 else f"({cross} < 0)"
        terms.append(f"(CASE WHEN {straddle} AND {left} "
                     f"THEN 1 ELSE 0 END)")
    if not terms:
        return "FALSE"
    return f"((({' + '.join(terms)}) % 2) = 1)"


def geo_polygon(events: DataFrame,
                vertices_m: list[tuple[int, int]]) -> DataFrame:
    """ES ``geo_polygon`` query: events whose point falls inside the
    (possibly non-convex) polygon, even-odd rule, all-integer — a
    pure narrow filter Catalyst pushes straight onto the scan, no
    shuffle at any scale. ``vertices_m`` are (lon_m, lat_m) integer
    millidegree pairs. Reference scope: Lucene's LatLonPoint
    newPolygonQuery behind the reference searcher (GROUP_12
    SearchFiles.java:1)."""
    g = with_geo_m(events)
    return g.where(point_in_polygon_m(F.col("lat_m"), F.col("lon_m"),
                                      vertices_m))


def geo_line(events: DataFrame, size: int,
             group_col: str = "event_type") -> DataFrame:
    """ES ``geo_line`` aggregation: per group, the track of points
    ordered by (ts, event_id) truncated to the first ``size``, plus
    the ES ``complete`` flag (true iff nothing was truncated).
    Points stay integer millidegrees end-to-end (array<long> output,
    exact cross-engine).

    Scale shape: the row_number window partitions BY GROUP (never a
    global single-partition window); rows beyond ``size`` are dropped
    BEFORE the collect, so each group ships at most ``size`` points
    through the agg shuffle — ES enforces the same cap (size ≤ 10k)
    for the same reason. At 100 TB the sort-per-group is the honest
    cost of the operator's ordered-track contract; a ts-bucketed
    pre-partitioning would bound each sort run."""
    from pyspark.sql import Window

    g = with_geo_m(events)
    w = Window.partitionBy(group_col).orderBy(F.asc("ts"),
                                              F.asc("event_id"))
    pts = (g.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= F.lit(size))
           .groupBy(group_col)
           .agg(F.array_sort(
               F.collect_list(F.struct("rn", "lon_m", "lat_m")))
               .alias("pts")))
    totals = (events.groupBy(group_col)
              .agg(F.count(F.lit(1)).alias("n_total")))
    return (pts.join(totals, group_col)
            .select(F.col(group_col),
                    F.transform("pts", lambda s: s["lon_m"])
                    .alias("lons_m"),
                    F.transform("pts", lambda s: s["lat_m"])
                    .alias("lats_m"),
                    F.size("pts").cast("long").alias("n_points"),
                    F.col("n_total"),
                    (F.col("n_total") <= F.lit(size)).alias("complete")))


ENVELOPE_RELATIONS = ("intersects", "within", "contains", "disjoint")


def with_envelope(events: DataFrame, dw_mod: int,
                  dh_mod: int) -> DataFrame:
    """Attach a deterministic per-event RECTANGLE (ES ``envelope``
    shape) in integer millidegrees: centered on the event point with
    half-extents 200 + (event_id·31) mod dw_mod / 200 + (event_id·17)
    mod dh_mod — widely varying sizes so every spatial relation has
    satisfying docs. Columns (x1, x2, y1, y2), all int64."""
    g = with_geo_m(events)
    dw = (F.lit(200) + (F.col("event_id") * F.lit(31)) % F.lit(dw_mod))
    dh = (F.lit(200) + (F.col("event_id") * F.lit(17)) % F.lit(dh_mod))
    return (g.withColumn("x1", (F.col("lon_m") - dw).cast("long"))
            .withColumn("x2", (F.col("lon_m") + dw).cast("long"))
            .withColumn("y1", (F.col("lat_m") - dh).cast("long"))
            .withColumn("y2", (F.col("lat_m") + dh).cast("long")))


def envelope_sql_cte(dw_mod: int, dh_mod: int,
                     table: str = "events") -> str:
    """DuckDB CTE body mirroring :func:`with_envelope`."""
    return (f"SELECT *, "
            f"({_LON_M_EXPR} - (200 + (event_id * 31) % {dw_mod})) AS x1, "
            f"({_LON_M_EXPR} + (200 + (event_id * 31) % {dw_mod})) AS x2, "
            f"({_LAT_M_EXPR} - (200 + (event_id * 17) % {dh_mod})) AS y1, "
            f"({_LAT_M_EXPR} + (200 + (event_id * 17) % {dh_mod})) AS y2 "
            f"FROM {table}")


def _envelope_relation(q: tuple[int, int, int, int],
                       relation: str) -> Column:
    """ES geo_shape spatial relation between the doc envelope
    (x1..y2 columns) and the query envelope q = (qx1, qx2, qy1, qy2)
    — pure int64 interval comparisons, the DE-9IM cases an envelope
    pair can express. ES semantics: intersects = any shared point
    (closed boxes, so touching edges intersect), within = doc ⊆ q,
    contains = doc ⊇ q, disjoint = ¬intersects."""
    qx1, qx2, qy1, qy2 = q
    x1, x2 = F.col("x1"), F.col("x2")
    y1, y2 = F.col("y1"), F.col("y2")
    inter = ((x1 <= F.lit(qx2)) & (x2 >= F.lit(qx1))
             & (y1 <= F.lit(qy2)) & (y2 >= F.lit(qy1)))
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return ~inter
    if relation == "within":
        return ((x1 >= F.lit(qx1)) & (x2 <= F.lit(qx2))
                & (y1 >= F.lit(qy1)) & (y2 <= F.lit(qy2)))
    if relation == "contains":
        return ((x1 <= F.lit(qx1)) & (x2 >= F.lit(qx2))
                & (y1 <= F.lit(qy1)) & (y2 >= F.lit(qy2)))
    raise ValueError(f"unknown geo_shape relation {relation!r}")


def _envelope_relation_sql(q: tuple[int, int, int, int],
                           relation: str) -> str:
    qx1, qx2, qy1, qy2 = q
    inter = (f"(x1 <= {qx2} AND x2 >= {qx1} "
             f"AND y1 <= {qy2} AND y2 >= {qy1})")
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return f"(NOT {inter})"
    if relation == "within":
        return (f"(x1 >= {qx1} AND x2 <= {qx2} "
                f"AND y1 >= {qy1} AND y2 <= {qy2})")
    if relation == "contains":
        return (f"(x1 <= {qx1} AND x2 >= {qx2} "
                f"AND y1 <= {qy1} AND y2 >= {qy2})")
    raise ValueError(f"unknown geo_shape relation {relation!r}")


def geo_shape_query(events: DataFrame, q: tuple[int, int, int, int],
                    relation: str, dw_mod: int, dh_mod: int) -> DataFrame:
    """ES ``geo_shape`` query (envelope vs envelope): the documents
    whose shape stands in ``relation`` to the query envelope — a pure
    narrow int64 filter, no shuffle. Reference scope: Lucene's
    LatLonShape queries behind the reference's searcher stack
    (GROUP_12 SearchFiles.java:1)."""
    e = with_envelope(events, dw_mod, dh_mod)
    return e.where(_envelope_relation(q, relation))


def geo_shape_counts(events: DataFrame, q: tuple[int, int, int, int],
                     dw_mod: int, dh_mod: int) -> DataFrame:
    """All four geo_shape relations in ONE conditional-agg pass
    (relations overlap by definition — within ⊆ intersects — so this
    is the ip_range shape, not a group-by): per relation the doc
    count and min matching event_id (a value probe beyond the bare
    count)."""
    e = with_envelope(events, dw_mod, dh_mod)
    aggs, stack_args = [], []
    for i, rel in enumerate(ENVELOPE_RELATIONS):
        cond = _envelope_relation(q, rel)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                    .cast("long").alias(f"n_{i}"))
        aggs.append(F.min(F.when(cond, F.col("event_id")))
                    .alias(f"f_{i}"))
        stack_args.append(f"'{rel}', n_{i}, f_{i}")
    wide = e.agg(*aggs)
    return wide.selectExpr(
        f"stack({len(ENVELOPE_RELATIONS)}, {', '.join(stack_args)}) "
        f"AS (relation, n, first_id)")


def geo_shape_counts_sql(q: tuple[int, int, int, int], dw_mod: int,
                         dh_mod: int, table: str = "events") -> str:
    """DuckDB twin of :func:`geo_shape_counts`."""
    cte = envelope_sql_cte(dw_mod, dh_mod, table)
    parts = []
    for rel in ENVELOPE_RELATIONS:
        cond = _envelope_relation_sql(q, rel)
        parts.append(
            f"SELECT '{rel}' AS relation, "
            f"count(CASE WHEN {cond} THEN 1 END)::BIGINT AS n, "
            f"min(CASE WHEN {cond} THEN event_id END)::BIGINT "
            f"AS first_id FROM e")
    return f"WITH e AS ({cte}) " + " UNION ALL ".join(parts)


def geo_bounds_centroid(events: DataFrame) -> DataFrame:
    """ES geo_bounds + geo_centroid per event_type: bounding box
    corners (exact min/max) and the micro-unit-exact centroid."""
    g = with_geo(events)
    lat_mu = F.floor(F.col("lat") * F.lit(1e6) + F.lit(0.5)).cast("long")
    lon_mu = F.floor(F.col("lon") * F.lit(1e6) + F.lit(0.5)).cast("long")
    cnt = F.count(F.lit(1))
    return (g.groupBy("event_type")
            .agg(round_half_up(F.min("lat"), 6).alias("min_lat"),
                 round_half_up(F.max("lat"), 6).alias("max_lat"),
                 round_half_up(F.min("lon"), 6).alias("min_lon"),
                 round_half_up(F.max("lon"), 6).alias("max_lon"),
                 round_half_up(F.sum(lat_mu) / cnt / F.lit(1e6), 6)
                 .alias("centroid_lat"),
                 round_half_up(F.sum(lon_mu) / cnt / F.lit(1e6), 6)
                 .alias("centroid_lon"),
                 cnt.alias("n")))
