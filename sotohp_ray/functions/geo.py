"""Scalar geo kernels (M15): DMS -> decimal degrees and haversine
distance — reference analogs ``modules/model/.../package.scala:519-536``
(degreeMinuteSecondsToDecimalDegree) and ``model/Location.scala:53-70``
(distanceTo, haversine on a 6371 km sphere). Vectorized numpy; the
haversine formula is mirrored verbatim in the SQL oracle
(pipelines/relational.py:customer_geo_distance_sql).
"""

from __future__ import annotations

import re

import numpy as np

EARTH_RADIUS_KM = 6371.0

_DMS_RE = re.compile(
    r"""^\s*(?P<deg>\d+(?:\.\d+)?)\s*[°d]\s*
        (?:(?P<min>\d+(?:\.\d+)?)\s*['m]\s*)?
        (?:(?P<sec>\d+(?:\.\d+)?)\s*(?:"|''|s)\s*)?
        (?P<hemi>[NSEWnsew])?\s*$""",
    re.VERBOSE,
)


def dms_to_decimal(text: str) -> float:
    """'40°26\\'46\"N' -> 40.446111...; sign from the hemisphere letter
    (S/W negative), matching the reference's GPS-EXIF conversion."""
    m = _DMS_RE.match(text)
    if not m:
        raise ValueError(f"unparseable DMS coordinate: {text!r}")
    deg = float(m.group("deg"))
    deg += float(m.group("min") or 0.0) / 60.0
    deg += float(m.group("sec") or 0.0) / 3600.0
    hemi = (m.group("hemi") or "N").upper()
    return -deg if hemi in ("S", "W") else deg


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float
) -> np.ndarray:
    """Great-circle distance in km, vectorized over point arrays."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(lat2)
    dp = np.radians(lat2 - np.asarray(lat1, dtype=np.float64))
    dl = np.radians(lon2 - np.asarray(lon1, dtype=np.float64))
    a = (
        np.sin(dp / 2.0) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))
