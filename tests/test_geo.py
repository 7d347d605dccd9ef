"""Unit + property tests for the pure-numpy geo core (SURVEY.md §5.2.3, §7.2).

No Spark needed here — fast feedback on the hardest pure-code item
(cell math at face boundaries, SURVEY.md §7 'hard parts' #1).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from engine import geo
from engine.config import EARTH_RADIUS_M

RNG = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# haversine / projection
# ---------------------------------------------------------------------------

def test_haversine_known_values():
    # one degree of latitude at the equator
    d = geo.haversine_m(0.0, 0.0, 1.0, 0.0)
    assert abs(d - np.pi * EARTH_RADIUS_M / 180.0) < 1e-6
    # zero distance
    assert geo.haversine_m(45.0, 45.0, 45.0, 45.0) == 0.0
    # antipodal
    d = geo.haversine_m(0.0, 0.0, 0.0, 180.0)
    assert abs(d - np.pi * EARTH_RADIUS_M) < 1e-3


def test_equirect_roundtrip():
    lat = RNG.uniform(-60, 60, 1000)
    lon = RNG.uniform(-179, 179, 1000)
    x, y = geo.equirect_project(lat, lon, 43.65, -79.38)
    lat2, lon2 = geo.equirect_unproject(x, y, 43.65, -79.38)
    np.testing.assert_allclose(lat, lat2, atol=1e-9)
    np.testing.assert_allclose(lon, lon2, atol=1e-9)


def test_equirect_local_distance_close_to_haversine():
    # within a few km the planar distance should match haversine to < 0.1%
    lat0, lon0 = 43.65, -79.38
    lat = lat0 + RNG.uniform(-0.01, 0.01, 500)
    lon = lon0 + RNG.uniform(-0.01, 0.01, 500)
    x, y = geo.equirect_project(lat, lon, lat0, lon0)
    planar = np.sqrt(x**2 + y**2)
    hav = geo.haversine_m(lat0, lon0, lat, lon)
    np.testing.assert_allclose(planar, hav, rtol=1e-3, atol=0.5)


# ---------------------------------------------------------------------------
# Hilbert curve
# ---------------------------------------------------------------------------

def test_hilbert_roundtrip_small():
    order = 4
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = geo.hilbert_xy2d(order, xs.ravel(), ys.ravel())
    # bijective over the full grid
    assert sorted(d.tolist()) == list(range(n * n))
    x2, y2 = geo.hilbert_d2xy(order, d)
    np.testing.assert_array_equal(x2, xs.ravel())
    np.testing.assert_array_equal(y2, ys.ravel())


def test_hilbert_adjacency():
    # consecutive d -> unit grid steps (the defining Hilbert property)
    order = 6
    d = np.arange((1 << (2 * order)))
    x, y = geo.hilbert_d2xy(order, d)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (step == 1).all()


def test_hilbert_prefix_property():
    # xy2d(L, x>>k, y>>k) == xy2d(30, x, y) >> 2k  — parent/child is a shift
    x = RNG.integers(0, 1 << 30, 5000)
    y = RNG.integers(0, 1 << 30, 5000)
    d30 = geo.hilbert_xy2d(30, x, y)
    for L in (4, 10, 16, 25):
        k = 30 - L
        dl = geo.hilbert_xy2d(L, x >> k, y >> k)
        np.testing.assert_array_equal(dl, d30 >> (2 * k))


# ---------------------------------------------------------------------------
# cell ids
# ---------------------------------------------------------------------------

def _random_latlng(n, rng=RNG):
    # uniform on the sphere (incl. high latitudes)
    z = rng.uniform(-1, 1, n)
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(z))
    return lat, lon


def test_cell_encode_decode_center_roundtrip():
    lat, lon = _random_latlng(5000)
    for level in (4, 10, 16, 20):
        cid = geo.cell_encode(lat, lon, level)
        assert (geo.cell_level(cid) == level).all()
        clat, clon = geo.cell_center_latlng(cid, level)
        # center must be within one cell diagonal of the input point
        d = geo.haversine_m(lat, lon, clat, clon)
        assert d.max() < 2.0 * geo.cell_edge_m(level)
        # re-encoding the center gives the same cell
        cid2 = geo.cell_encode(clat, clon, level)
        np.testing.assert_array_equal(cid, cid2)


def test_cell_parent_containment():
    lat, lon = _random_latlng(5000)
    fine = geo.cell_encode(lat, lon, 16)
    for coarse_level in (14, 10, 4):
        coarse_direct = geo.cell_encode(lat, lon, coarse_level)
        coarse_via_parent = geo.cell_parent(fine, coarse_level)
        np.testing.assert_array_equal(coarse_direct, coarse_via_parent)
        assert (geo.cell_level(coarse_via_parent) == coarse_level).all()


def test_cell_edge_cases():
    # poles, antimeridian, face corners
    lat = np.array([90.0, -90.0, 0.0, 0.0, 45.0, -45.0, 35.26, 0.0])
    lon = np.array([0.0, 0.0, 180.0, -180.0, 45.0, -135.0, 45.0, 0.0])
    for level in (1, 10, 16, 30):
        cid = geo.cell_encode(lat, lon, level)
        assert (geo.cell_level(cid) == level).all()
        clat, clon = geo.cell_center_latlng(cid, level)
        d = geo.haversine_m(lat, lon, clat, clon)
        assert d.max() < 2.0 * geo.cell_edge_m(level)
    # +180 and -180 are the same meridian -> same cell
    c1 = geo.cell_encode(np.array([10.0]), np.array([180.0]), 16)
    c2 = geo.cell_encode(np.array([10.0]), np.array([-180.0]), 16)
    assert c1[0] == c2[0]


def test_cell_neighbors_ring1():
    lat, lon = _random_latlng(500)
    level = 16
    cid = geo.cell_encode(lat, lon, level)
    neigh = geo.cell_neighbors(cid, level, k=1)
    assert neigh.shape == (500, 9)
    # self is included
    assert (neigh == cid[:, None]).any(axis=1).all()
    # all neighbors are valid cells at the same level
    flat = np.unique(neigh.ravel())
    assert (geo.cell_level(flat) == level).all()
    # neighbor centers are within ~2.5 cell diagonals
    for col in range(9):
        nlat, nlon = geo.cell_center_latlng(neigh[:, col], level)
        d = geo.haversine_m(lat, lon, nlat, nlon)
        assert d.max() < 4.0 * geo.cell_edge_m(level)


def test_cell_neighbors_cover_nearby_points():
    """The J1 candidate-join guarantee: any point within cluster_distance of
    another point must share a ring-1 cell neighborhood AT THE LEVEL THE
    ENGINE PICKS (level_for_radius).  Quadratic-ST cells are up to ~40%
    shorter than the nominal edge near face corners, so the sample is
    adversarial: clusters at cube-face corners/edge midpoints (where the
    metric distortion peaks) plus uniform noise, at distances just under the
    radius."""
    from engine.episodes import level_for_radius
    rng = np.random.default_rng(7)
    radius = 100.0
    level = level_for_radius(radius)
    assert level < 16  # the round-1 bug: nominal-edge sizing picked 16

    # face corners: xyz (+-1,+-1,+-1)/sqrt(3) -> lat ~ +-35.264, lon 45+90k;
    # face-edge midpoints: (+-1,+-1,0)/sqrt(2) etc.
    corner_lat = np.degrees(np.arctan2(1.0, np.sqrt(2.0)))
    hot = [(s * corner_lat, 45.0 + 90.0 * k) for s in (-1, 1) for k in range(4)]
    hot += [(0.0, 45.0 + 90.0 * k) for k in range(4)]
    hot += [(45.0, 90.0 * k) for k in range(4)]
    n_per = 60
    lat0, lon0 = [], []
    for hlat, hlon in hot:
        lat0.append(hlat + rng.uniform(-0.02, 0.02, n_per))
        lon0.append(hlon + rng.uniform(-0.02, 0.02, n_per))
    lat0.append(rng.uniform(-65, 65, 600))
    lon0.append(rng.uniform(-179.5, 179.5, 600))
    lat0 = np.concatenate(lat0)
    lon0 = np.concatenate(lon0)
    n = len(lat0)
    # displace by just under the radius in a random direction (worst case)
    theta = rng.uniform(0, 2 * np.pi, n)
    dist = rng.uniform(0.9 * radius, radius, n)
    dlat = np.degrees(dist * np.sin(theta) / EARTH_RADIUS_M)
    dlon = np.degrees(dist * np.cos(theta)
                      / (EARTH_RADIUS_M * np.cos(np.radians(lat0))))
    lat1, lon1 = lat0 + dlat, lon0 + dlon
    c1 = geo.cell_encode(lat1, lon1, level)
    n0 = geo.cell_neighbors(geo.cell_encode(lat0, lon0, level), level, k=1)
    covered = (n0 == c1[:, None]).any(axis=1)
    assert covered.all(), f"{(~covered).sum()}/{n} pairs missed ring-1 cover"


@settings(max_examples=200, deadline=None)
@given(st.floats(-89.9, 89.9), st.floats(-180.0, 180.0), st.integers(1, 30))
def test_cell_encode_scalar_property(lat, lon, level):
    cid = geo.cell_encode(np.array([lat]), np.array([lon]), level)
    assert geo.cell_level(cid)[0] == level
    clat, clon = geo.cell_center_latlng(cid, level)
    assert geo.haversine_m(lat, lon, clat[0], clon[0]) < 2.0 * geo.cell_edge_m(level)


# ---------------------------------------------------------------------------
# point-in-polygon + cover
# ---------------------------------------------------------------------------

SQUARE = np.array([[-79.40, 43.64], [-79.38, 43.64], [-79.38, 43.66],
                   [-79.40, 43.66], [-79.40, 43.64]])


def test_pip_square():
    lon = np.array([-79.39, -79.41, -79.39, -79.385, -79.37])
    lat = np.array([43.65, 43.65, 43.63, 43.641, 43.65])
    inside = geo.points_in_ring(lon, lat, SQUARE)
    np.testing.assert_array_equal(inside, [True, False, False, True, False])


def test_pip_concave():
    # L-shaped polygon
    ring = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]],
                    dtype=float)
    lon = np.array([0.5, 1.5, 1.5, 0.5, 2.5])
    lat = np.array([0.5, 0.5, 1.5, 1.5, 0.5])
    inside = geo.points_in_ring(lon, lat, ring)
    np.testing.assert_array_equal(inside, [True, True, False, True, False])


def test_pip_antimeridian():
    ring = np.array([[179.9, -0.1], [-179.9, -0.1], [-179.9, 0.1],
                     [179.9, 0.1], [179.9, -0.1]])
    lon = np.array([179.95, -179.95, 179.0, 0.0])
    lat = np.array([0.0, 0.0, 0.0, 0.0])
    inside = geo.points_in_ring(lon, lat, ring)
    np.testing.assert_array_equal(inside, [True, True, False, False])


def test_polygon_cover_contains_all_inside_cells():
    level = 16
    cover = set(geo.polygon_cell_cover(SQUARE, level).tolist())
    # every random point inside the polygon must land in a covered cell
    rng = np.random.default_rng(3)
    lon = rng.uniform(-79.40, -79.38, 2000)
    lat = rng.uniform(43.64, 43.66, 2000)
    inside = geo.points_in_ring(lon, lat, SQUARE)
    cells = geo.cell_encode(lat[inside], lon[inside], level)
    assert set(cells.tolist()) <= cover
    # and the cover is not absurdly large (superset, but tight-ish)
    assert len(cover) < 600


def test_polygon_cover_antimeridian():
    ring = np.array([[179.99, -0.01], [-179.99, -0.01], [-179.99, 0.01],
                     [179.99, 0.01], [179.99, -0.01]])
    level = 16
    cover = set(geo.polygon_cell_cover(ring, level).tolist())
    rng = np.random.default_rng(4)
    lon = np.where(rng.random(500) < 0.5,
                   rng.uniform(179.99, 180.0, 500),
                   rng.uniform(-180.0, -179.99, 500))
    lat = rng.uniform(-0.01, 0.01, 500)
    cells = geo.cell_encode(lat, lon, level)
    assert set(cells.tolist()) <= cover


def test_hilbert_nibble_table_equals_loop():
    """The 4-bit FSM lookup (native codegen path) == the loop xy2d, at every
    level including odd pads."""
    from engine.functions import _hilbert_nibble_table
    tab = _hilbert_nibble_table()
    rng = np.random.default_rng(3)
    for level in (1, 2, 3, 4, 7, 10, 15, 16, 23, 30):
        n = 1 << level
        x = rng.integers(0, n, 20000)
        y = rng.integers(0, n, 20000)
        rounds = (level + 3) // 4
        xx, yy = (y, x) if (4 * rounds - level) % 2 else (x, y)
        d = np.zeros_like(xx)
        state = np.zeros_like(xx)
        for r in range(rounds - 1, -1, -1):
            idx = state * 256 + ((xx >> (4 * r)) & 15) * 16 + ((yy >> (4 * r)) & 15)
            val = tab[idx]
            d = (d << 8) | (val >> 2)
            state = val & 3
        np.testing.assert_array_equal(d, geo.hilbert_xy2d(level, x, y))


def test_encode_cell_native_matches_numpy(spark):
    """Spark-native cell encode (whole-stage codegen) is bit-exact vs the
    numpy kernel on adversarial coords: global uniform, face corners, poles,
    date line, equator-axis crossings."""
    import pandas as pd

    from engine.functions import encode_cell_native
    rng = np.random.default_rng(7)
    lat = np.concatenate([
        rng.uniform(-90, 90, 30000),
        rng.uniform(35.2, 35.3, 500),
        np.full(50, 90.0), np.full(50, -90.0),
        rng.uniform(-1e-6, 1e-6, 500),
        np.degrees(np.arctan(1 / np.sqrt(2))) + rng.uniform(-1e-7, 1e-7, 500),
    ])
    lon = np.concatenate([
        rng.uniform(-180, 180, 30000),
        rng.uniform(44.9, 45.1, 500),
        rng.uniform(-180, 180, 100),
        rng.uniform(-180, 180, 500),
        45.0 + rng.uniform(-1e-7, 1e-7, 500),
    ])
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    for level in (4, 15, 16):
        got = (encode_cell_native(df, "lat", "lon", "cid", level)
               .select("cid").toPandas()["cid"].to_numpy())
        np.testing.assert_array_equal(got, geo.cell_encode(lat, lon, level))


def test_decode_and_kring_native_match_numpy(spark):
    """Spark-native cell decode (inverse Hilbert FSM) and the k-ring
    explode are bit-exact vs the numpy kernels — including odd-pad levels
    and cells hugging face edges/corners, where the ring crosses onto
    adjacent cube faces through the extended-ST path (trig-free on both
    sides, so float agreement is the same IEEE +,-,*,/,sqrt contract the
    encode test pins)."""
    import pandas as pd

    from engine.functions import decode_cell_native, explode_kring_native
    from pyspark.sql import functions as F
    rng = np.random.default_rng(11)
    lat = np.concatenate([
        rng.uniform(-90, 90, 8000),
        np.full(300, 45.0) + rng.uniform(-2e-5, 2e-5, 300),   # face edge
        np.degrees(np.arctan(1 / np.sqrt(2))) + rng.uniform(-1e-5, 1e-5, 300),
    ])
    lon = np.concatenate([
        rng.uniform(-180, 180, 8000),
        rng.uniform(-180, 180, 300),
        45.0 + rng.uniform(-1e-5, 1e-5, 300),                 # face corner
    ])
    for level, k in ((4, 1), (13, 2), (15, 1), (16, 1), (16, 2)):
        cid = np.unique(geo.cell_encode(lat, lon, level))
        df = spark.createDataFrame(pd.DataFrame({"cell_id": cid}))
        dec = (decode_cell_native(df, "cell_id", level)
               .toPandas().sort_values("cell_id"))
        f0, i0, j0 = geo.cell_to_face_ij(dec["cell_id"].to_numpy(np.int64),
                                         level)
        np.testing.assert_array_equal(dec["_dface"].to_numpy(), f0)
        np.testing.assert_array_equal(dec["_di"].to_numpy(), i0)
        np.testing.assert_array_equal(dec["_dj"].to_numpy(), j0)
        got = (explode_kring_native(df, level, k=k)
               .groupBy("cell_id")
               .agg(F.sort_array(F.collect_list(F.struct("pos", "ncell")))
                    .alias("nb"))
               .toPandas().set_index("cell_id"))
        want = geo.cell_neighbors(cid, level, k=k)
        for idx, c in enumerate(cid):
            nb = [r["ncell"] for r in got.loc[c, "nb"]]
            assert nb == want[idx].tolist(), (level, k, c)
