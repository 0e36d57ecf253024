"""Tiny deterministic CRS registry (no pyproj in this environment).

The engine needs invertible pixel-CRS <-> lon/lat transforms for multi-CRS
rasters (the reference reprojects via pyproj/rasterio,
`src/rasteret/core/utils.py:119-179`).  Here every supported CRS is a *linear*
map so the math is exact, vectorizable, and reproducible in ANSI SQL for the
DuckDB oracles:

    EPSG:4326        identity (lon/lat degrees)
    EPSG:326zz       x = (lon - lon0) * 111320,  y = lat * 110540
                     with lon0 = zz*6 - 183 (UTM-zone-shaped equirectangular)

Registered as a plain dict -> broadcast-friendly, mirroring rasteret's
runtime registries (`src/rasteret/constants.py:49-88`).
"""

from __future__ import annotations

import numpy as np

M_PER_DEG_X = 111320.0
M_PER_DEG_Y = 110540.0


def utm_lon0(epsg: int) -> float:
    zone = epsg - 32600
    return zone * 6.0 - 183.0


def to_lonlat(epsg: int, x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if epsg == 4326:
        return x, y
    if 32601 <= epsg <= 32660:
        return x / M_PER_DEG_X + utm_lon0(epsg), y / M_PER_DEG_Y
    raise ValueError(f"unregistered CRS {epsg}")


def from_lonlat(epsg: int, lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if epsg == 4326:
        return lon, lat
    if 32601 <= epsg <= 32660:
        return (lon - utm_lon0(epsg)) * M_PER_DEG_X, lat * M_PER_DEG_Y
    raise ValueError(f"unregistered CRS {epsg}")
