"""Property tests for the cross-engine SQL twins (DuckDB side, no
Spark session needed — the Spark side is pinned to the same builders
in test_geo.py/test_categorize_ip.py, so agreement with the pure-
Python references here closes the triangle)."""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import geo
from engine.pipeline.curation import IP_MIX, ip32_sql

LATS = st.floats(min_value=-90.0, max_value=90.0,
                 allow_nan=False, allow_infinity=False)
LONS = st.floats(min_value=-180.0, max_value=180.0,
                 allow_nan=False, allow_infinity=False)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _dbl(x: float) -> str:
    # long float reprs parse as DECIMAL in DuckDB (DECIMAL+DECIMAL
    # then overflows on +180.0) — the oracles always feed DOUBLE
    # columns, so literals in tests must be cast the same way
    return f"CAST({x!r} AS DOUBLE)"


def _ref_geohash_quantized(lat, lon, precision):
    """Independent python replica of the quantized-index definition —
    exact for every input (the classic interval-halving form agrees
    everywhere except within one float-addition ulp of a cell edge,
    where library implementations differ too; semantics are pinned by
    the published vectors in test_geo.py)."""
    total, lon_bits, lat_bits = geo._geohash_dims(precision)
    lon_q = min(int(math.floor((lon + 180.0) / 360.0 * (1 << lon_bits))),
                (1 << lon_bits) - 1)
    lat_q = min(int(math.floor((lat + 90.0) / 180.0 * (1 << lat_bits))),
                (1 << lat_bits) - 1)
    combined = 0
    for j in range(total):
        src, bits = (lon_q, lon_bits) if j % 2 == 0 else (lat_q, lat_bits)
        combined |= ((src >> (bits - 1 - j // 2)) & 1) << (total - 1 - j)
    return "".join(
        geo.GEOHASH_ALPHABET[(combined >> (total - 5 * (c + 1))) & 31]
        for c in range(precision))


@settings(max_examples=200, deadline=None)
@given(lat=LATS, lon=LONS, precision=st.integers(1, 8))
def test_geohash_sql_matches_python(con, lat, lon, precision):
    got = con.sql(
        f"SELECT {geo.geohash_sql(_dbl(lat), _dbl(lon), precision)}"
    ).fetchone()[0]
    assert got == _ref_geohash_quantized(lat, lon, precision)


@settings(max_examples=200, deadline=None)
@given(lat=LATS, lon=LONS, zoom=st.integers(0, 12))
def test_geotile_sql_matches_python(con, lat, lon, zoom):
    got = con.sql(
        f"SELECT {geo.geotile_sql(_dbl(lat), _dbl(lon), zoom)}"
    ).fetchone()[0]
    n = 1 << zoom
    x = min(int((lon + 180.0) / 360.0 * n), n - 1)
    latc = max(min(lat, geo.MERCATOR_MAX_LAT), -geo.MERCATOR_MAX_LAT)
    rad = latc * geo.DEG
    merc = (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
            / geo.PI) / 2.0
    merc = math.floor(merc * 1e9 + 0.5) / 1e9
    y = max(min(int(math.floor(merc * n)), n - 1), 0)
    assert got == f"{zoom}/{x}/{y}"


@settings(max_examples=200, deadline=None)
@given(lat=LATS, lon=LONS)
def test_haversine_sql_close_to_math(con, lat, lon):
    lat0, lon0 = 48.8566, 2.3522
    got = con.sql(
        f"SELECT {geo.haversine_km_sql(_dbl(lat), _dbl(lon), lat0, lon0)}"
    ).fetchone()[0]
    p1, p0 = math.radians(lat), math.radians(lat0)
    a = (math.sin(math.radians(lat - lat0) / 2) ** 2
         + math.cos(p1) * math.cos(p0)
         * math.sin(math.radians(lon - lon0) / 2) ** 2)
    want = 2 * geo.EARTH_RADIUS_KM * math.asin(math.sqrt(min(a, 1.0)))
    assert got == pytest.approx(want, abs=1e-6)


@settings(max_examples=200, deadline=None)
@given(uid=st.integers(0, 10_000_000))
def test_ip32_sql_matches_python(con, uid):
    got = con.sql(
        f"SELECT {ip32_sql(str(uid))}").fetchone()[0]
    assert got == (uid * IP_MIX) % (1 << 32)


@settings(max_examples=100, deadline=None)
@given(msg=st.text(
    alphabet=st.sampled_from("abz 019_-.X"), min_size=0, max_size=40),
    max_tokens=st.integers(1, 6))
def test_categorize_sql_matches_python(con, msg, max_tokens):
    import re

    from engine.pipeline.textstats import categorize_text_sql

    sql = categorize_text_sql(
        f"(SELECT {msg!r} AS text)", max_tokens=max_tokens, top_n=10)
    rows = con.sql(sql).fetchall()
    toks = [t for t in re.split("[^a-z0-9]+", msg.lower()) if t]
    norm = ["<num>" if re.search("[0-9]", t) else t
            for t in toks[:max_tokens]]
    if not norm:
        assert rows == []
    else:
        assert rows == [(" ".join(norm), 1, 1)]


# ---------------------------------------------------------------------------
# r5 closing wave: point-in-polygon SQL twin (all-integer ray cast)
# ---------------------------------------------------------------------------

COORD = st.integers(min_value=-180000, max_value=180000)


def _ref_pip(x, y, verts):
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


@settings(max_examples=200, deadline=None)
@given(verts=st.lists(st.tuples(COORD, COORD), min_size=3, max_size=8),
       x=COORD, y=COORD)
def test_point_in_polygon_sql_matches_python(con, verts, x, y):
    # even-odd parity is well-defined for ANY vertex list (including
    # self-intersecting) — random polygons are a fair property space
    pred = geo.point_in_polygon_m_sql(str(y), str(x), verts)
    got = con.sql(f"SELECT {pred}").fetchone()[0]
    assert got == _ref_pip(x, y, verts)
