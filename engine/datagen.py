"""Deterministic synthetic `web_pages` + `activity_polygons` (FIXTURES.md §1-2).

Pure numpy/pandas, seed-stable: rng streams are keyed per host
(``default_rng([seed, host])``) so adding hosts never perturbs existing ones.
The movement model plants known stops/visits so KDE peaks (A2-A5), episode
segmentation (W3-W5) and kNN assignment (J1) have known answers; goldens are
computed by the independent oracle in tests/oracle_ref.py, truth here is for
semantic sanity checks only.

Corruption rates (FIXTURES.md §1): ~5%% token-less pages (F5), ~8%% acc>100 m
(F2), ~2%% exact consecutive-duplicate coords (F3), ~1%% interior teleport
outliers (G1).  Host page counts are Zipf(1.2) so one mega-host exists
(skew-salting exercise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import EARTH_RADIUS_M

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

_FILLER = [
    "The quarterly report was published on the municipal website.",
    "Local residents gathered for the annual street festival.",
    "A new transit schedule takes effect at the end of the month.",
    "The library announced extended opening hours for the summer.",
    "Construction on the waterfront path continues as planned.",
    "Volunteers planted trees along the ravine trail this weekend.",
]


def _offset_latlon(lat, lon, dist_m, bearing_rad):
    dlat = np.degrees(dist_m * np.cos(bearing_rad) / EARTH_RADIUS_M)
    dlon = np.degrees(dist_m * np.sin(bearing_rad) /
                      (EARTH_RADIUS_M * np.cos(np.radians(lat))))
    return lat + dlat, lon + dlon


def _gen_host(h: int, n_pages: int, seed: int):
    rng = np.random.default_rng([seed, h])
    base_lat = float(rng.uniform(-60.0, 60.0))
    base_lon = float(rng.uniform(-175.0, 175.0))
    n_stops = int(rng.integers(2, 5))
    # stop centers 300-2000 m from base, pairwise >= 250 m apart
    stops = []
    while len(stops) < n_stops:
        lat, lon = _offset_latlon(base_lat, base_lon,
                                  rng.uniform(300.0, 2000.0),
                                  rng.uniform(0, 2 * np.pi))
        ok = all(_approx_dist_m(lat, lon, a, b) >= 250.0 for a, b in stops)
        if ok:
            stops.append((lat, lon))
    stops = np.array(stops)

    t = float(rng.uniform(0, 30 * 86400))  # seconds past EPOCH
    rows_t, rows_lat, rows_lon = [], [], []
    visit_rows = []  # (stop_id, t_start, t_end)
    last_stop = -1
    while len(rows_t) < n_pages:
        stop_id = int(rng.choice([s for s in range(n_stops) if s != last_stop]))
        last_stop = stop_id
        dwell = float(rng.uniform(900.0, 7200.0))
        t_start = t
        while t < t_start + dwell and len(rows_t) < n_pages:
            lat, lon = _offset_latlon(stops[stop_id, 0], stops[stop_id, 1],
                                      abs(rng.normal(0.0, 10.0)),
                                      rng.uniform(0, 2 * np.pi))
            rows_t.append(t); rows_lat.append(lat); rows_lon.append(lon)
            t += float(rng.uniform(30.0, 240.0))
        visit_rows.append((stop_id, t_start, t))
        if rng.random() < 0.25:
            t += float(rng.uniform(2 * 3600.0, 3 * 86400.0))  # observation gap
        else:
            # travel leg toward the next stop (straight line, 5-15 m/s)
            nxt = int(rng.choice([s for s in range(n_stops) if s != stop_id]))
            d = _approx_dist_m(*stops[stop_id], *stops[nxt])
            speed = float(rng.uniform(5.0, 15.0))
            dur = d / speed
            t_leg0 = t
            while t < t_leg0 + dur and len(rows_t) < n_pages:
                f = (t - t_leg0) / dur
                lat = stops[stop_id, 0] + f * (stops[nxt, 0] - stops[stop_id, 0])
                lon = stops[stop_id, 1] + f * (stops[nxt, 1] - stops[stop_id, 1])
                lat, lon = _offset_latlon(lat, lon, abs(rng.normal(0.0, 5.0)),
                                          rng.uniform(0, 2 * np.pi))
                rows_t.append(t); rows_lat.append(lat); rows_lon.append(lon)
                t += float(rng.uniform(30.0, 240.0))
            last_stop = stop_id  # next visit may pick nxt naturally

    n = len(rows_t)
    ts = np.array(rows_t)
    lat = np.array(rows_lat)
    lon = np.array(rows_lon)
    acc = rng.uniform(3.0, 50.0, n)
    bad_acc = rng.random(n) < 0.08
    acc[bad_acc] = rng.uniform(101.0, 500.0, int(bad_acc.sum()))
    no_token = rng.random(n) < 0.05
    # exact sequential duplicates (~2%, never at position 0)
    dup = (rng.random(n) < 0.02) & (np.arange(n) > 0)
    idx = np.where(dup)[0]
    lat[idx] = lat[idx - 1]
    lon[idx] = lon[idx - 1]
    acc[idx] = acc[idx - 1]
    # interior teleports (~1%, never first/last of the host stream)
    tele = (rng.random(n) < 0.01) & (np.arange(n) > 0) & (np.arange(n) < n - 1)
    tele &= ~dup
    ti = np.where(tele)[0]
    tlat, tlon = _offset_latlon(lat[ti], lon[ti],
                                rng.uniform(10_000.0, 50_000.0, len(ti)),
                                rng.uniform(0, 2 * np.pi, len(ti)))
    lat[ti], lon[ti] = tlat, tlon

    host = f"host{h:04d}.example"
    urls = [f"https://{host}/p/{i:06d}" for i in range(n)]
    lang = rng.choice(["en", "fr", "de"], size=n, p=[0.8, 0.1, 0.1])
    filler_idx = rng.integers(0, len(_FILLER), n)
    texts, htmls = [], []
    for i in range(n):
        token = "" if no_token[i] else (
            f" [geo:{lat[i]:.6f},{lon[i]:.6f};acc={acc[i]:.1f}]")
        text = _FILLER[filler_idx[i]] + token
        texts.append(text)
        htmls.append(("<html><head><meta charset=\"utf-8\"/></head><body><p>"
                      + text + "</p></body></html>").encode("utf-8"))
    pages = pd.DataFrame({
        "url": urls,
        "warc_ts": EPOCH + (ts * 1e6).astype("timedelta64[us]"),
        "html": htmls,
        "text": texts,
        "lang": lang,
    })
    truth_stops = pd.DataFrame({
        "host": host, "stop_id": range(n_stops),
        "lat": stops[:, 0], "lon": stops[:, 1],
    })
    truth_visits = pd.DataFrame(visit_rows, columns=["stop_id", "t_start", "t_end"])
    truth_visits.insert(0, "host", host)
    return pages, truth_stops, truth_visits


def _approx_dist_m(lat1, lon1, lat2, lon2):
    x = np.radians(lon2 - lon1) * np.cos(np.radians((lat1 + lat2) / 2.0))
    y = np.radians(lat2 - lat1)
    return EARTH_RADIUS_M * np.sqrt(x * x + y * y)


def zipf_page_counts(n_hosts: int, total_pages: int, exponent: float = 1.2):
    w = 1.0 / np.arange(1, n_hosts + 1, dtype=np.float64) ** exponent
    counts = np.maximum((w / w.sum() * total_pages).astype(int), 20)
    return counts


def gen_web_pages(n_hosts: int = 40, total_pages: int = 10_000, seed: int = 42,
                  processes: int = 1):
    """Returns (pages_df, truth_stops_df, truth_visits_df).

    `processes > 1` parallelizes host generation (hosts are independent,
    seeded per host, results concatenated in host order — output identical
    to the serial path)."""
    counts = zipf_page_counts(n_hosts, total_pages)
    args = [(h, int(counts[h]), seed) for h in range(n_hosts)]
    if processes > 1:
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(max_workers=processes) as ex:
            results = list(ex.map(_gen_host_args, args, chunksize=8))
    else:
        results = [_gen_host(*a) for a in args]
    pages = [r[0] for r in results]
    stops = [r[1] for r in results]
    visits = [r[2] for r in results]
    return (pd.concat(pages, ignore_index=True),
            pd.concat(stops, ignore_index=True),
            pd.concat(visits, ignore_index=True))


def _gen_host_args(a):
    return _gen_host(*a)


def gen_activity_polygons(truth_stops: pd.DataFrame, seed: int = 42):
    """One irregular 6-12-gon (~50-200 m radius) around each planted stop,
    plus 2 far decoys and 1 antimeridian-straddling polygon (FIXTURES.md §2).
    Returns DataFrame(polygon_id, name, ring) with ring = [[lon, lat], ...].
    """
    rng = np.random.default_rng([seed, 777])
    rows = []
    pid = 0
    for _, r in truth_stops.iterrows():
        k = int(rng.integers(6, 13))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(50.0, 200.0, k)
        lat, lon = _offset_latlon(r["lat"], r["lon"], rad, ang)
        ring = [[float(lo), float(la)] for lo, la in zip(lon, lat)]
        ring.append(ring[0])
        rows.append((pid, f"stop:{r['host']}:{int(r['stop_id'])}", ring))
        pid += 1
    for i in range(2):  # decoys in the middle of the ocean
        clat, clon = -40.0 - i, -120.0 - i
        ang = np.linspace(0, 2 * np.pi, 9)[:-1]
        lat, lon = _offset_latlon(clat, clon, np.full(8, 150.0), ang)
        ring = [[float(lo), float(la)] for lo, la in zip(lon, lat)]
        ring.append(ring[0])
        rows.append((pid, f"decoy:{i}", ring))
        pid += 1
    ring = [[179.995, -0.005], [-179.995, -0.005], [-179.995, 0.005],
            [179.995, 0.005], [179.995, -0.005]]
    rows.append((pid, "antimeridian", ring))
    return pd.DataFrame(rows, columns=["polygon_id", "name", "ring"])


def pages_to_spark(spark, pages: pd.DataFrame):
    """pandas -> Spark DataFrame with the canonical web_pages schema."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ])
    return spark.createDataFrame(pages, schema=schema)


# ---------------------------------------------------------------------------
# web_pages derived from the driver's `events` table (portable arithmetic)
# ---------------------------------------------------------------------------

def web_pages_from_events(events, n_stops: int = 3, stop_switch_s: int = 21600,
                          time_compress: int = 30, min_splits: int | None = None):
    """Deterministic `web_pages` built from the driver's events table with
    integer-arithmetic pseudo-randomness ONLY (no hash functions), so the
    exact same construction is expressible in DuckDB SQL for oracle parity.

    Movement model: each user (-> host) has `n_stops` fixed stop centers;
    the active stop switches every `stop_switch_s` seconds of event time, so
    per-host event streams show dwell clusters with transitions — giving the
    KDE/episode operators real structure at any driver scale factor.

    `time_compress` shrinks event time 30x around 2024-01-01 (micros are
    integer-divided, exact in both engines): the driver's events span ~30
    days at ~1 h mean gaps, which sessionization (gap_s = 1 h) would shred
    into single-point subsets; compressed, traces are dense (~2 min gaps)
    with ~12 min dwells per 6 h-switch visit, so KDE locations, kNN and
    episodes all get real work at any sf.
    """
    from pyspark.sql import functions as F
    # The driver's events table arrives as ONE small parquet split, so the
    # scan — and every downstream consumer of the (regex-heavy) generated
    # text — would serialize on a single core.  Every expression below is
    # row-local, so fan the input out first when it is under-split (the
    # guide's unsplittable-input remedy).  Hash-partition on the unique
    # event_id: deterministic under task retry (no round-robin sort) and
    # uniform.  `min_splits` parameterizes the target (default 2x cluster
    # parallelism); inputs already split at least that wide pass through
    # untouched, so a real many-split corpus pays nothing.
    if min_splits is None:
        min_splits = 2 * events.sparkSession.sparkContext.defaultParallelism
    if min_splits > 1 and events.rdd.getNumPartitions() < min_splits:
        events = events.repartition(min_splits, F.col("event_id"))
    uid = F.col("user_id").cast("long")
    eid = F.col("event_id").cast("long")
    tsd = F.col("ts").cast("timestamp").cast("double")
    base_us = 1704067200000000  # 2024-01-01T00:00:00Z in epoch micros
    warc_ts = F.timestamp_micros(
        ((F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(base_us))
         / F.lit(time_compress)).cast("long") + F.lit(base_us))
    stop = F.pmod(F.floor(tsd / F.lit(float(stop_switch_s))).cast("long"),
                  F.lit(n_stops))
    stop_lat = (F.pmod(uid * F.lit(2654435761) + stop * F.lit(40503) + F.lit(17),
                       F.lit(120000001)).cast("double") / 1e6 - 60.0)
    stop_lon = (F.pmod(uid * F.lit(2654435761) + stop * F.lit(40503) + F.lit(9176),
                       F.lit(350000001)).cast("double") / 1e6 - 175.0)
    # jitter in EXACT micro-degree steps (±150 µdeg ≈ ±16 m) so printed
    # %.6f values are never near a decimal rounding tie — Java (HALF_UP on
    # shortest-repr) and C printf (half-even on exact binary) would disagree
    # on ties, breaking the DuckDB oracle's byte-equality.
    jlat = ((F.pmod(eid * F.lit(48271) + F.lit(11), F.lit(301)).cast("double")
             - 150.0) * 1e-6)
    jlon = ((F.pmod(eid * F.lit(48271) + F.lit(523), F.lit(301)).cast("double")
             - 150.0) * 1e-6)
    lat = stop_lat + jlat
    lon = stop_lon + jlon
    acc = F.pmod(eid * F.lit(69621) + F.lit(5), F.lit(1200)).cast("double") / 10.0
    no_token = F.pmod(eid * F.lit(16807) + F.lit(3), F.lit(100)) < 5
    lang_code = F.pmod(eid * F.lit(7919) + F.lit(1), F.lit(10))
    lang = (F.when(lang_code <= 6, "en").when(lang_code == 7, "fr")
             .when(lang_code == 8, "de").otherwise("zz"))
    token = F.when(no_token, F.lit("")).otherwise(
        F.concat(F.lit(" [geo:"), F.format_string("%.6f", lat), F.lit(","),
                 F.format_string("%.6f", lon), F.lit(";acc="),
                 F.format_string("%.1f", acc), F.lit("]")))
    text = F.concat(F.lit("Event "), F.col("event_type"), F.lit(" recorded."),
                    token)
    return events.select(
        F.format_string("https://host%04d.example/p/%09d",
                        F.pmod(uid, F.lit(10000)).cast("int"),
                        eid.cast("int")).alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><head><meta charset=\"utf-8\"/></head>"
                                "<body><p>"), text, F.lit("</p></body></html>")),
                 "utf-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"))
