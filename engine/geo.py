"""Pure-numpy geospatial core (no Spark imports) — SURVEY.md §7.2.

Implements, from scratch and fully vectorized (BASELINE.json:6 forbids
per-row Python):

* haversine great-circle distance      (reference analog: REF
  spatial_functions.py::distance [M] — SURVEY.md §2.7 X2 fixes haversine,
  R = 6371008.8 m, as normative)
* local equirectangular projection     (REF spatial_functions.py::project [M])
* an S2-style hierarchical cell id     (SURVEY.md §2.7 X6 — graft-mandated,
  BASELINE.json:14: lat/lng -> unit XYZ -> cube face -> quadratic ST ->
  (i,j) -> Hilbert position -> 64-bit id; levels 0..30)
* vectorized ray-casting point-in-polygon + polygon cell cover (J4 support)

Cell-id format (S2-compatible layout, not bit-identical to Google S2 —
the Hilbert orientation differs; ids are only ever compared to ids produced
by this module):

    bits 63..61 : face (0..5)
    below       : 2*level Hilbert-position bits, then a single 1 sentinel
                  bit, then zeros.  level = 30 - (trailing_zeros >> 1).

Faces 4 and 5 set bit 63, so ids are negative when viewed as int64 (Spark
``LongType``) — they are opaque keys; ordering within a face is the Hilbert
order, which is what locality-sensitive partitioning needs.
"""

from __future__ import annotations

import numpy as np

from .config import EARTH_RADIUS_M

MAX_LEVEL = 30
_FACE_SHIFT = 61
_ONES_60 = (1 << 60) - 1


# ---------------------------------------------------------------------------
# distance / projection
# ---------------------------------------------------------------------------

def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters (vectorized, float64)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def equirect_project(lat, lon, lat0, lon0):
    """Local equirectangular lon/lat -> planar meters anchored at (lat0, lon0).

    Normative projection for the per-host KDE grid (SURVEY.md §2.9).
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x = EARTH_RADIUS_M * np.cos(np.radians(lat0)) * np.radians(lon - lon0)
    y = EARTH_RADIUS_M * np.radians(lat - lat0)
    return x, y


def equirect_unproject(x, y, lat0, lon0):
    lat = lat0 + np.degrees(np.asarray(y, dtype=np.float64) / EARTH_RADIUS_M)
    lon = lon0 + np.degrees(
        np.asarray(x, dtype=np.float64) / (EARTH_RADIUS_M * np.cos(np.radians(lat0))))
    return lat, lon


# ---------------------------------------------------------------------------
# Hilbert curve (classic iterative xy<->d, vectorized; order <= 30)
# ---------------------------------------------------------------------------

def hilbert_xy2d(order: int, x, y):
    """(x, y) on a 2^order grid -> Hilbert curve position (int64).

    Hierarchical: xy2d(L, x >> k, y >> k) == xy2d(order, x, y) >> 2k for
    k = order - L, which is what makes parent/child a bit shift.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(x.shape, dtype=np.int64)
    n = np.int64(1) << order
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant (flip uses n-1-x == x XOR (n-1): pure bit flip)
        swap = ry == 0
        flip = swap & (rx == 1)
        x = np.where(flip, n - 1 - x, x)
        y = np.where(flip, n - 1 - y, y)
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s >>= 1
    return d


def hilbert_d2xy(order: int, d):
    """Inverse of :func:`hilbert_xy2d`."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros(t.shape, dtype=np.int64)
    y = np.zeros(t.shape, dtype=np.int64)
    s = np.int64(1)
    n = np.int64(1) << order
    while s < n:
        rx = np.int64(1) & (t >> 1)
        ry = np.int64(1) & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == 1)
        x = np.where(flip, s - 1 - x, x)
        y = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        x = x + s * rx
        y = y + s * ry
        t >>= 2
        s <<= 1
    return x, y


# ---------------------------------------------------------------------------
# cube-face projection (S2-style quadratic ST)
# ---------------------------------------------------------------------------

def _latlng_to_xyz(lat, lon):
    # normalize lon to [-180, 180) so +180 and -180 encode identically
    lon = ((np.asarray(lon, dtype=np.float64) + 180.0) % 360.0) - 180.0
    latr = np.radians(np.asarray(lat, dtype=np.float64))
    lonr = np.radians(lon)
    cl = np.cos(latr)
    return cl * np.cos(lonr), cl * np.sin(lonr), np.sin(latr)


def _xyz_to_latlng(x, y, z):
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    # negative-axis faces are +3
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    one = np.ones_like(u)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [one, -u, -u, -one, v, v])
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [u, one, -v, -v, -one, u])
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [v, v, one, -u, -u, -one])
    return x, y, z


def _uv_to_st(u):
    """Quadratic projection: equal-ish area cells (same formula as S2)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0.0,
                        0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s):
    """Inverse of :func:`_uv_to_st`; continuous for s outside [0, 1] so that
    out-of-face neighbor steps land on the adjacent face after re-projection."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5,
                    (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


# ---------------------------------------------------------------------------
# cell id encode / decode / hierarchy
# ---------------------------------------------------------------------------

def _lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def cell_from_face_ij(face, i, j, level: int):
    """(face, i, j) at `level` -> cell id (int64 array).

    Packing is done in uint64 (faces 4/5 set bit 63) then reinterpreted as
    int64 for Spark LongType compatibility.
    """
    face_u = np.asarray(face, dtype=np.int64).astype(np.uint64)
    d = hilbert_xy2d(level, i, j).astype(np.uint64)  # 2*level bits
    shift = np.uint64(2 * (MAX_LEVEL - level))
    # face(3) | d(2*level) | sentinel(1) | zeros
    pos = (d << (shift + np.uint64(1))) | (np.uint64(1) << shift)
    cid = (face_u << np.uint64(_FACE_SHIFT)) | pos
    return cid.view(np.int64)


def cell_encode(lat, lon, level: int):
    """lat/lon (deg) -> cell id at `level` (vectorized; int64)."""
    x, y, z = _latlng_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    n = 1 << level
    i = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    return cell_from_face_ij(face, i, j, level)


def cell_level(cid):
    """Level of each cell id (from the sentinel bit position)."""
    cid = np.asarray(cid).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    tz = np.zeros(cid.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (v & np.uint64((1 << shift) - 1)) == 0
        big = v != 0
        step = mask & big
        tz += np.where(step, shift, 0)
        v = np.where(step, v >> np.uint64(shift), v)
    return MAX_LEVEL - (tz >> 1)


def cell_to_face_ij(cid, level: int):
    """cell id (must be at `level`) -> (face, i, j)."""
    u = np.asarray(cid).view(np.uint64)
    face = (u >> np.uint64(_FACE_SHIFT)).astype(np.int64)
    shift = 2 * (MAX_LEVEL - level) + 1
    d = ((u & np.uint64(_ONES_60 << 1 | 1)) >> np.uint64(shift)).astype(np.int64)
    i, j = hilbert_d2xy(level, d)
    return face, i, j


def cell_parent(cid, level: int):
    """Parent at coarser `level` — pure bit math (mirrors the native Spark
    expression in engine.functions.parent_cell_col)."""
    u = np.asarray(cid).view(np.uint64)
    lsb = np.uint64(_lsb_for_level(level))
    return ((u & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb).view(np.int64)


def cell_center_latlng(cid, level: int):
    face, i, j = cell_to_face_ij(cid, level)
    n = float(1 << level)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    x, y, z = _face_uv_to_xyz(face, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    return _xyz_to_latlng(x / norm, y / norm, z / norm)


def cell_edge_m(level: int) -> float:
    """Approximate cell edge length in meters at `level`."""
    return (np.pi / 2.0) * EARTH_RADIUS_M / (1 << level)


def cell_neighbors(cid, level: int, k: int = 1):
    """k-ring neighborhood (incl. self): shape (n, (2k+1)^2) int64.

    In-face steps are exact (face,i,j) re-encodes; steps past a face edge go
    through the extended quadratic ST -> uv -> XYZ path and re-project onto
    the adjacent face DIRECTLY (face pick and u=y/x ratios are scale
    invariant, so no normalization and no lat/lng roundtrip) — the whole
    off-face step is +,-,*,/,sqrt on IEEE doubles, which lets the Spark
    native twin (engine.functions.explode_kring_native) be bit-exact
    without relying on cross-library trig agreement.  Duplicate ids may
    appear near corners — callers dedupe (explode + distinct or
    array_distinct).
    """
    cid = np.asarray(cid, dtype=np.int64)
    face, i, j = cell_to_face_ij(cid, level)
    n = 1 << level
    offsets = [(di, dj) for di in range(-k, k + 1) for dj in range(-k, k + 1)]
    out = np.empty((cid.shape[0], len(offsets)), dtype=np.int64)
    for col, (di, dj) in enumerate(offsets):
        ni, nj = i + di, j + dj
        in_face = (ni >= 0) & (ni < n) & (nj >= 0) & (nj < n)
        res = np.empty_like(cid)
        if in_face.any():
            res[in_face] = cell_from_face_ij(
                face[in_face], ni[in_face], nj[in_face], level)
        off = ~in_face
        if off.any():
            s = (ni[off].astype(np.float64) + 0.5) / n
            t = (nj[off].astype(np.float64) + 0.5) / n
            u, v = _st_to_uv(s), _st_to_uv(t)
            x, y, z = _face_uv_to_xyz(face[off], u, v)
            nface, nu, nv = _xyz_to_face_uv(x, y, z)
            i2 = np.clip((_uv_to_st(nu) * n).astype(np.int64), 0, n - 1)
            j2 = np.clip((_uv_to_st(nv) * n).astype(np.int64), 0, n - 1)
            res[off] = cell_from_face_ij(nface, i2, j2, level)
        out[:, col] = res
    return out


# ---------------------------------------------------------------------------
# point-in-polygon (vectorized ray casting) + polygon cell cover
# ---------------------------------------------------------------------------

def _unwrap_ring(ring):
    """Return ring as (m,2) float64 with lons unwrapped (antimeridian-safe)."""
    ring = np.asarray(ring, dtype=np.float64)
    lon = ring[:, 0].copy()
    lon[1:] = lon[0] + ((lon[1:] - lon[0] + 180.0) % 360.0) - 180.0
    out = ring.copy()
    out[:, 0] = lon
    return out


def points_in_ring(lon, lat, ring):
    """Ray-casting containment test of points against one closed ring.

    `ring` is [[lon, lat], ...] with ring[0] == ring[-1] (closed, no holes).
    Boundary behavior: half-open (standard crossing parity) — deterministic.
    Vectorized over points x edges.
    """
    ring = _unwrap_ring(ring)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    # wrap point lons into the ring's unwrapped frame
    lon = ring[0, 0] + ((lon - ring[0, 0] + 180.0) % 360.0) - 180.0
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    py = lat[:, None]
    px = lon[:, None]
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / np.where(y1 == y0, np.inf, y1 - y0)
    crossings = cond & (px < xint)
    return (crossings.sum(axis=1) & 1).astype(bool)


def _densify_ring(ring, step_m: float):
    """Sample points along ring edges every <= step_m meters."""
    ring = _unwrap_ring(ring)
    pts = []
    for a, b in zip(ring[:-1], ring[1:]):
        d = haversine_m(a[1], a[0], b[1], b[0])
        nseg = max(int(np.ceil(d / step_m)), 1)
        f = np.arange(nseg, dtype=np.float64) / nseg
        pts.append(np.stack([a[0] + f * (b[0] - a[0]),
                             a[1] + f * (b[1] - a[1])], axis=1))
    return np.concatenate(pts, axis=0)


def polygon_cell_cover(ring, level: int):
    """Superset cover: all level-`level` cells that may intersect the polygon.

    Strategy (SURVEY.md §2.3 J4): densify the boundary at half-cell spacing
    and encode; BFS-fill the interior from the vertex centroid through ring-1
    neighbors whose centers test inside; dilate the boundary cells by ring-1.
    Guarantees a superset for the exact PIP refine step (false positives are
    filtered there; dilation closes false-negative gaps).
    Returns sorted unique int64 cell ids.
    """
    edge_m = cell_edge_m(level)
    boundary_pts = _densify_ring(ring, edge_m / 2.0)
    boundary = cell_encode(boundary_pts[:, 1], boundary_pts[:, 0], level)
    dilated = np.unique(cell_neighbors(np.unique(boundary), level, k=1).ravel())
    cover = set(dilated.tolist())
    # interior flood-fill: BFS inward from the (dilated) boundary shell
    # through cells whose centers test inside — handles concave polygons
    frontier = set(dilated.tolist())
    visited: set[int] = set()
    guard = 0
    while frontier and guard < 1_000_000:
        batch = np.fromiter(frontier, dtype=np.int64, count=len(frontier))
        visited.update(frontier)
        guard += len(batch)
        lat_c, lon_c = cell_center_latlng(batch, level)
        inside = points_in_ring(lon_c, lat_c, ring)
        keep = batch[inside]
        cover.update(keep.tolist())
        if len(keep) == 0:
            break
        neigh = np.unique(cell_neighbors(keep, level, k=1).ravel())
        frontier = set(neigh.tolist()) - visited
    return np.array(sorted(cover), dtype=np.int64)
