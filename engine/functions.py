"""Spark column-expression library (SURVEY.md §2.7).

Design rule (§4.2): prefer native, codegen-able column expressions; drop to
Arrow-vectorized pandas UDFs ONLY for the cell math that genuinely needs
numpy (Hilbert bit interleaving).  No per-row Python anywhere
(BASELINE.json:6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geo
from .config import EARTH_RADIUS_M

# ---------------------------------------------------------------------------
# native expressions (JVM-side, whole-stage-codegen'd)
# ---------------------------------------------------------------------------

def epoch_s(col: Column) -> Column:
    """Timestamp (TZ or NTZ) -> epoch seconds as double (microsecond exact).

    NTZ values are interpreted in the session time zone, which the engine
    pins to UTC (engine/session.py) — matching DuckDB's naive-as-UTC
    ``epoch()`` so oracle comparisons are exact.
    """
    return col.cast("timestamp").cast("double")


def haversine_m_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle meters as a native expression (X2) — identical math to
    engine.geo.haversine_m so Spark-side and numpy-side distances agree."""
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    h = (
        F.pow(F.sin((rlat2 - rlat1) / 2.0), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2.0), 2)
    )
    h = F.least(F.greatest(h, F.lit(0.0)), F.lit(1.0))
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def _signed64(x: int) -> int:
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def parent_cell_col(cell: Column, level: int) -> Column:
    """Parent cell at coarser `level` — pure bit math, no UDF (X6).

    Mirrors engine.geo.cell_parent:  (id & ~(2*lsb-1)) | lsb.
    """
    lsb = 1 << (2 * (geo.MAX_LEVEL - level))
    mask = _signed64(~(2 * lsb - 1))
    return cell.bitwiseAND(F.lit(mask)).bitwiseOR(F.lit(lsb))


def host_from_url(url: Column) -> Column:
    """Registrable-host extraction (graft user key, SURVEY.md §1.2)."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


# Geotag token grammar (FIXTURES.md §1, X5): [geo:<lat>,<lon>;acc=<m>]
# lat/lon at exactly 6 decimals, acc one decimal — byte-stable regex.
GEOTAG_RE = r"\[geo:(-?\d+\.\d{6}),(-?\d+\.\d{6});acc=(\d+\.\d)\]"


def geotag_token(text: Column) -> Column:
    """The whole matched geotag token ('' if absent) — ONE regex pass."""
    return F.regexp_extract(text, GEOTAG_RE, 0)


def geotag_cols_from_token(tok: Column) -> tuple[Column, Column, Column]:
    """(lat, lon, acc_m) parsed from a matched token with cheap substring
    ops (no further regex).  Token grammar is fixed (FIXTURES.md §1):
    [geo:<lat>,<lon>;acc=<m>] — values byte-identical to the 3-group regex
    parse, so the DuckDB oracles (which use regexp groups) agree exactly."""
    # strip "[geo:" (5 chars) and the trailing "]"
    body = F.substring(tok, F.lit(6), F.length(tok) - 6)
    lat = F.nullif(F.substring_index(body, ",", 1), F.lit("")).cast("double")
    rest = F.substring_index(body, ",", -1)
    lon = F.nullif(F.substring_index(rest, ";", 1), F.lit("")).cast("double")
    acc = F.nullif(F.substring_index(rest, "=", -1), F.lit("")).cast("double")
    return lat, lon, acc


def geotag_cols(text: Column) -> tuple[Column, Column, Column]:
    """(lat, lon, acc_m) doubles extracted from `text`; null if no token."""
    lat = F.nullif(F.regexp_extract(text, GEOTAG_RE, 1), F.lit("")).cast("double")
    lon = F.nullif(F.regexp_extract(text, GEOTAG_RE, 2), F.lit("")).cast("double")
    acc = F.nullif(F.regexp_extract(text, GEOTAG_RE, 3), F.lit("")).cast("double")
    return lat, lon, acc


# ---------------------------------------------------------------------------
# Arrow-vectorized UDFs (the sanctioned slow path: numpy cell math only)
# ---------------------------------------------------------------------------

def make_cell_encode_udf(level: int):
    """pandas_udf: (lat, lon) -> cell id at `level` (LongType)."""

    @F.pandas_udf(T.LongType())
    def cell_encode_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = geo.cell_encode(lat.to_numpy(np.float64), lon.to_numpy(np.float64),
                              level)
        return pd.Series(out)

    return cell_encode_udf


def make_cell_neighbors_udf(level: int, k: int = 1):
    """pandas_udf: cell id -> array<long> of the (2k+1)^2 k-ring ids."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cell_neighbors_udf(cid: pd.Series) -> pd.Series:
        arr = geo.cell_neighbors(cid.to_numpy(np.int64), level, k=k)
        return pd.Series(list(arr))

    return cell_neighbors_udf


def make_cell_center_udf(level: int):
    """pandas_udf: cell id -> struct(lat double, lon double) of cell center."""

    @F.pandas_udf("lat double, lon double")
    def cell_center_udf(cid: pd.Series) -> pd.DataFrame:
        lat, lon = geo.cell_center_latlng(cid.to_numpy(np.int64), level)
        return pd.DataFrame({"lat": lat, "lon": lon})

    return cell_center_udf
