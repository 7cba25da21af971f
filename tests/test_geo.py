"""ES geo family (engine/geo.py): known public vectors + pure-Python
reference implementations for geohash / geotile / haversine, plus the
query/agg surfaces over a deterministic point set."""

import math

import pytest
from pyspark.sql import functions as F

from engine import geo

# ---------------------------------------------------------------------------
# Pure-Python references (independent of the engine's bit arithmetic)
# ---------------------------------------------------------------------------


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Classic interval-halving geohash encoder (public algorithm)."""
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, even, out, ch = 0, True, [], 0
    while len(out) < precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch <<= 1
        if v >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(geo.GEOHASH_ALPHABET[ch])
            bits, ch = 0, 0
    return "".join(out)


def _ref_geotile(lat: float, lon: float, zoom: int) -> str:
    n = 1 << zoom
    x = min(int((lon + 180.0) / 360.0 * n), n - 1)
    lat = max(min(lat, geo.MERCATOR_MAX_LAT), -geo.MERCATOR_MAX_LAT)
    rad = math.radians(lat)
    merc = (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
            / math.pi) / 2.0
    merc = math.floor(merc * 1e9 + 0.5) / 1e9
    return f"{zoom}/{x}/{max(min(int(merc * n), n - 1), 0)}"


def _ref_haversine_km(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * geo.EARTH_RADIUS_KM * math.asin(math.sqrt(min(a, 1.0)))


def _points(spark, n=300):
    ids = spark.range(n).select(F.col("id").alias("event_id"))
    return geo.with_geo(
        ids.withColumn("event_type", F.concat(F.lit("t"),
                                              (F.col("event_id") % 3)
                                              .cast("string")))
        .withColumn("value", (F.col("event_id") % 17).cast("double")))


# ---------------------------------------------------------------------------
# Known public vectors
# ---------------------------------------------------------------------------

KNOWN_GEOHASH = [
    # the canonical wikipedia example + axes/origin probes
    (57.64911, 10.40744, 5, "u4pru"),
    (57.64911, 10.40744, 3, "u4p"),
    (0.0, 0.0, 5, "s0000"),
    (48.8566, 2.3522, 5, "u09tv"),       # Paris
    (-33.8688, 151.2093, 5, "r3gx2"),    # Sydney
]


def test_geohash_known_vectors(spark):
    rows = [(la, lo, p, want) for la, lo, p, want in KNOWN_GEOHASH]
    for la, lo, p, want in rows:
        assert _ref_geohash(la, lo, p) == want, "reference impl drifted"
        df = spark.createDataFrame([(la, lo)], "lat double, lon double")
        got = df.select(geo.geohash(F.col("lat"), F.col("lon"), p)
                        .alias("g")).first()["g"]
        assert got == want, (la, lo, p, got)


def test_geohash_matches_reference_on_grid(spark):
    pts = _points(spark, 400)
    for precision in (1, 2, 4, 7):
        got = (pts.select("lat", "lon",
                          geo.geohash(F.col("lat"), F.col("lon"),
                                      precision).alias("g"))
               .collect())
        for r in got:
            assert r["g"] == _ref_geohash(r["lat"], r["lon"], precision)


def test_geotile_known_vector_and_reference(spark):
    # OSM slippy-map example: London at zoom 7 -> tile 63/42
    df = spark.createDataFrame([(51.5074, -0.1278)],
                               "lat double, lon double")
    got = df.select(geo.geotile(F.col("lat"), F.col("lon"), 7)
                    .alias("t")).first()["t"]
    assert got == "7/63/42"
    pts = _points(spark, 400)
    for zoom in (0, 3, 8):
        rows = (pts.select("lat", "lon",
                           geo.geotile(F.col("lat"), F.col("lon"), zoom)
                           .alias("t")).collect())
        for r in rows:
            assert r["t"] == _ref_geotile(r["lat"], r["lon"], zoom)


def test_haversine_matches_reference(spark):
    pts = _points(spark, 300)
    lat0, lon0 = 48.8566, 2.3522
    rows = (pts.select("lat", "lon",
                       geo.haversine_km(F.col("lat"), F.col("lon"),
                                        lat0, lon0).alias("d"))
            .collect())
    for r in rows:
        ref = _ref_haversine_km(r["lat"], r["lon"], lat0, lon0)
        assert r["d"] == pytest.approx(ref, abs=1e-6)
    # the classic long-haul pair: Paris <-> NYC ~ 5,837 km
    one = spark.createDataFrame([(40.7128, -74.0060)],
                                "lat double, lon double")
    d = one.select(geo.haversine_km(F.col("lat"), F.col("lon"),
                                    lat0, lon0).alias("d")).first()["d"]
    assert d == pytest.approx(5837.2, abs=0.5)


# ---------------------------------------------------------------------------
# SQL twins (op-order parity with DuckDB)
# ---------------------------------------------------------------------------

def test_sql_twins_bitwise_match_spark(spark):
    import duckdb

    pts = _points(spark, 500)
    got = (pts.select(
        "event_id", "lat", "lon",
        geo.geohash(F.col("lat"), F.col("lon"), 4).alias("gh"),
        geo.geotile(F.col("lat"), F.col("lon"), 6).alias("tile"))
        .orderBy("event_id").collect())
    con = duckdb.connect()
    con.sql("CREATE TABLE events AS SELECT * FROM "
            "range(500) t(event_id)")
    dsql = (f"WITH g AS ({geo.geo_sql_cte('events')}) "
            f"SELECT event_id, lat, lon, "
            f"{geo.geohash_sql('lat', 'lon', 4)} AS gh, "
            f"{geo.geotile_sql('lat', 'lon', 6)} AS tile "
            f"FROM g ORDER BY event_id")
    for s, d in zip(got, con.sql(dsql).fetchall()):
        assert (s["event_id"], s["lat"], s["lon"]) == d[:3]
        assert s["gh"] == d[3] and s["tile"] == d[4]
    # haversine: libm may differ in the tail; 3 dp rounding absorbs it
    hs = geo.haversine_km_sql("lat", "lon", 48.8566, 2.3522)
    duck = [r[0] for r in con.sql(
        f"WITH g AS ({geo.geo_sql_cte('events')}) "
        f"SELECT {hs} FROM g ORDER BY event_id").fetchall()]
    sp = [r["d"] for r in pts.select(
        "event_id", geo.haversine_km(F.col("lat"), F.col("lon"),
                                     48.8566, 2.3522).alias("d"))
        .orderBy("event_id").collect()]
    assert max(abs(a - b) for a, b in zip(sp, duck)) < 1e-9


# ---------------------------------------------------------------------------
# Query/agg surfaces
# ---------------------------------------------------------------------------

def test_bbox_filter_semantics(spark):
    pts = _points(spark, 300)
    box = {"top": 50.0, "bottom": -10.0, "left": -90.0, "right": 90.0}
    got = {r["event_id"]
           for r in geo.geo_bounding_box(
               pts.select("event_id", "event_type", "value"),
               **box).collect()}
    exp = {r["event_id"] for r in pts.collect()
           if box["bottom"] <= r["lat"] <= box["top"]
           and box["left"] <= r["lon"] <= box["right"]}
    assert got == exp and 0 < len(got) < 300


def test_distance_query_gate_and_rank(spark):
    pts = _points(spark, 300).select("event_id", "event_type", "value")
    out = (geo.geo_distance_query(pts, 48.8566, 2.3522, 6000.0, 20)
           .orderBy("rank").collect())
    assert len(out) == 20
    dists = [r["dist_km"] for r in out]
    assert all(d <= 6000.0 for d in dists)
    assert dists == sorted(dists)
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, 21))
    # the radius gate genuinely bites: some points are out of range
    all_d = geo.geo_distance_query(pts, 48.8566, 2.3522, 1e9, 300)
    assert all_d.where(F.col("dist_km") > 6000.0).count() > 0


def test_rings_partition_all_in_range_events(spark):
    pts = _points(spark, 300).select("event_id", "event_type", "value")
    edges = [0.0, 4000.0, 9000.0, 14000.0]
    out = geo.geo_distance_rings(pts, 40.7128, -74.0060, edges).collect()
    labels = {r["ring"] for r in out}
    assert labels <= {"0-4000", "4000-9000", "9000-14000", "14000-*"}
    assert len(labels) >= 3              # the edges split real mass
    assert sum(r["n"] for r in out) == 300   # every event in a ring
    # micro-unit mean equals the plain mean here (values are integral)
    for r in out:
        assert r["avg_value"] is not None


def test_grid_aggs_count_everything(spark):
    pts = _points(spark, 400).select("event_id", "event_type", "value")
    gh = (geo.geohash_grid(pts, top_n=10, precision=1)
          .orderBy("rank").collect())
    assert len(gh) == 10
    counts = [r["n"] for r in gh]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 1                 # bucketing genuinely groups
    tiles = geo.geotile_grid(pts, zoom=2).collect()
    assert sum(r["n"] for r in tiles) == 400
    assert all(r["cell"].startswith("2/") for r in tiles)


def test_bounds_centroid_matches_python(spark):
    pts = _points(spark, 300).select("event_id", "event_type", "value")
    rows = geo.with_geo(pts).collect()
    out = {r["event_type"]: r
           for r in geo.geo_bounds_centroid(pts).collect()}
    for et in {r["event_type"] for r in rows}:
        sub = [r for r in rows if r["event_type"] == et]
        got = out[et]
        assert got["n"] == len(sub)
        assert got["min_lat"] == pytest.approx(
            min(r["lat"] for r in sub), abs=1e-6)
        assert got["max_lon"] == pytest.approx(
            max(r["lon"] for r in sub), abs=1e-6)
        mu = [math.floor(r["lat"] * 1e6 + 0.5) for r in sub]
        want = math.floor((sum(mu) / len(mu) / 1e6) * 1e6 + 0.5) / 1e6
        assert got["centroid_lat"] == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------------------
# r5 closing wave: geo_polygon / geo_line
# ---------------------------------------------------------------------------

def _ref_pip(x: int, y: int, verts: list[tuple[int, int]]) -> bool:
    """Pure-Python even-odd integer ray cast (the public algorithm,
    written independently of the column codegen)."""
    cnt, n = 0, len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if y1 == y2:
            continue
        if (y1 > y) != (y2 > y):
            cross = (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1)
            if (cross > 0) if y2 > y1 else (cross < 0):
                cnt += 1
    return cnt % 2 == 1


DART = [(0, 0), (40000, 60000), (80000, 0), (40000, 20000)]


def test_polygon_matches_python_raycast(spark):
    pts = _points(spark, 400).select("event_id", "event_type")
    got = {r["event_id"]
           for r in geo.geo_polygon(pts, DART).collect()}
    rows = geo.with_geo_m(pts).collect()
    want = {r["event_id"] for r in rows
            if _ref_pip(r["lon_m"], r["lat_m"], DART)}
    assert got == want
    assert 0 < len(want) < 400


def test_polygon_concavity_bites(spark):
    # hand-pinned probes: wing points are inside the dart, the notch
    # point sits inside the bbox but OUTSIDE the polygon
    probes = [(20000, 25000, True),    # left wing
              (60000, 25000, True),    # right wing
              (40000, 5000, False),    # concave notch, inside bbox
              (40000, 40000, True),    # above the notch apex
              (-1000, 0, False)]       # left of everything
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat, _) in enumerate(probes)],
        "event_id long, lon_m long, lat_m long")
    got = df.select("event_id", geo.point_in_polygon_m(
        F.col("lat_m"), F.col("lon_m"), DART).alias("inside")).collect()
    for r in got:
        assert r["inside"] == probes[r["event_id"]][2], probes[r["event_id"]]
        assert _ref_pip(probes[r["event_id"]][0],
                        probes[r["event_id"]][1],
                        DART) == probes[r["event_id"]][2]


def test_geo_line_truncation_and_complete(spark):
    # two groups straddling the size: "big" (7 events) truncates at 5,
    # "small" (3 events) is complete; ts descends with event_id so the
    # (ts, event_id) ordering genuinely reorders vs insertion order
    rows = ([(i, "big", 100 - i) for i in range(7)]
            + [(100 + i, "small", 50 + i) for i in range(3)])
    ev = (spark.createDataFrame(rows, "event_id long, event_type string,"
                                " sec long")
          .withColumn("ts", F.timestamp_seconds(F.col("sec")))
          .drop("sec"))
    out = {r["event_type"]: r
           for r in geo.geo_line(ev, size=5).collect()}
    big, small = out["big"], out["small"]
    assert big["n_total"] == 7 and not big["complete"]
    assert big["n_points"] == 5 and len(big["lons_m"]) == 5
    assert small["n_total"] == 3 and small["complete"]
    assert small["n_points"] == 3
    # ts ascends for event_id 6..0, so the first 5 points are the
    # ids 6,5,4,3,2 in that order
    want_ids = [6, 5, 4, 3, 2]
    m = {r["event_id"]: (r["lon_m"], r["lat_m"])
         for r in geo.with_geo_m(ev).collect()}
    assert big["lons_m"] == [m[i][0] for i in want_ids]
    assert big["lats_m"] == [m[i][1] for i in want_ids]


# ---------------------------------------------------------------------------
# r5 closing wave: geo_shape envelope relations
# ---------------------------------------------------------------------------

Q_ENV = (2000, 30000, -10000, 14000)


def test_geo_shape_relations_algebra(spark):
    pts = _points(spark, 500).select("event_id", "event_type")
    env = geo.with_envelope(pts, 36000, 20000)
    rows = env.collect()
    got = {}
    for rel in geo.ENVELOPE_RELATIONS:
        got[rel] = {r["event_id"] for r in geo.geo_shape_query(
            pts, Q_ENV, rel, 36000, 20000).collect()}
    # independent python reference
    qx1, qx2, qy1, qy2 = Q_ENV
    for r in rows:
        x1, x2, y1, y2 = r["x1"], r["x2"], r["y1"], r["y2"]
        inter = x1 <= qx2 and x2 >= qx1 and y1 <= qy2 and y2 >= qy1
        assert (r["event_id"] in got["intersects"]) == inter
        assert (r["event_id"] in got["disjoint"]) == (not inter)
        assert (r["event_id"] in got["within"]) == (
            x1 >= qx1 and x2 <= qx2 and y1 >= qy1 and y2 <= qy2)
        assert (r["event_id"] in got["contains"]) == (
            x1 <= qx1 and x2 >= qx2 and y1 <= qy1 and y2 >= qy2)
    # relation algebra: within/contains imply intersects; disjoint is
    # the exact complement; every relation non-empty on this fixture
    assert got["within"] <= got["intersects"]
    assert got["contains"] <= got["intersects"]
    assert got["disjoint"] == {r["event_id"] for r in rows} - got["intersects"]
    # 500 sparse global points rarely nest boxes — intersects/disjoint
    # must bite here; the within/contains bite is pinned on hand-made
    # envelopes below and on the sf0.01 entry fixture (20/13 docs)
    assert got["intersects"] and got["disjoint"]


def test_geo_shape_every_relation_bites_on_pinned_envelopes(spark):
    # query envelope (0, 100, 0, 100); one doc box per relation class
    docs = [(0, -50, 150, -50, 150),     # contains (superset)
            (1, 20, 80, 20, 80),         # within (subset)
            (2, 90, 200, 50, 60),        # intersects only (overlap)
            (3, 300, 400, 300, 400),     # disjoint
            (4, 100, 200, 100, 200)]     # touches corner: intersects
    df = spark.createDataFrame(
        docs, "event_id long, x1 long, x2 long, y1 long, y2 long")
    q = (0, 100, 0, 100)
    want = {"intersects": {0, 1, 2, 4}, "within": {1},
            "contains": {0}, "disjoint": {3}}
    for rel, ids in want.items():
        got = {r["event_id"] for r in df.where(
            geo._envelope_relation(q, rel)).collect()}
        assert got == ids, rel


def test_geo_shape_counts_one_pass(spark):
    pts = _points(spark, 300).select("event_id", "event_type")
    out = {r["relation"]: r for r in geo.geo_shape_counts(
        pts, Q_ENV, 36000, 20000).collect()}
    assert set(out) == set(geo.ENVELOPE_RELATIONS)
    n = out["intersects"]["n"] + out["disjoint"]["n"]
    assert n == 300                       # exact complement split
    ids = {r["event_id"] for r in geo.geo_shape_query(
        pts, Q_ENV, "within", 36000, 20000).collect()}
    assert out["within"]["n"] == len(ids)
    assert out["within"]["first_id"] == (min(ids) if ids else None)
    with pytest.raises(ValueError):
        geo.geo_shape_query(pts, Q_ENV, "crosses", 36000, 20000)
