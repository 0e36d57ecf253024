"""Deterministic CRS registry: linear synthetic zones, real projections, and a
pluggable table (no pyproj in this environment).

The engine needs invertible pixel-CRS <-> lon/lat transforms for multi-CRS
rasters (the reference reprojects via pyproj/rasterio,
`src/rasteret/core/utils.py:119-179`).  Three tiers:

    EPSG:4326        identity (lon/lat degrees)
    EPSG:326zz       *linear* UTM-zone-shaped equirectangular
                     x = (lon - lon0) * 111320,  y = lat * 110540,
                     lon0 = zz*6 - 183.  Kept linear on purpose: the math is
                     exact and reproducible in ANSI SQL, which is what makes
                     the DuckDB oracles bit-exact (declared synthetic analogue).
    EPSG:3857        real spherical Web Mercator (closed form, separable)
    EPSG:327zz       real WGS84 UTM south via the Krueger flattening series
                     (order n^4, public math: Krueger 1912 / Karney 2011 as
                     summarized on the Transverse Mercator flattening-series
                     literature) — k0=0.9996, FE=500 km, FN=10 000 km.

``register_crs`` injects arbitrary additional codes (mirroring rasteret's
runtime registries, `src/rasteret/constants.py:49-88`); ``make_utm`` builds
real northern/southern UTM callables for registration under any code.  All
transforms are numpy-vectorized and run executor-side inside pandas UDF
batches; the registry dict travels by closure capture.

Separability: a CRS is *separable* when lon depends only on x and lat only on
y (linear zones, 4326, 3857).  Transverse Mercator is NOT separable (lon
depends on both x and y); consumers with per-axis fast paths must branch on
``is_separable`` and fall back to full-grid transforms.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

import numpy as np

M_PER_DEG_X = 111320.0
M_PER_DEG_Y = 110540.0

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WEB_MERCATOR_R = WGS84_A  # spherical Web Mercator uses the semi-major axis


class Projection(NamedTuple):
    to_lonlat: Callable  # (x, y) -> (lon, lat), numpy-vectorized
    from_lonlat: Callable  # (lon, lat) -> (x, y)
    separable: bool


_REGISTRY: dict[int, Projection] = {}


def register_crs(
    epsg: int,
    to_lonlat_fn: Callable,
    from_lonlat_fn: Callable,
    separable: bool = False,
) -> None:
    """Register/override a CRS.  Callables must be picklable (plain functions
    or cloudpickle-able closures) — they execute on executors."""
    _REGISTRY[int(epsg)] = Projection(to_lonlat_fn, from_lonlat_fn, bool(separable))


def utm_lon0(epsg: int) -> float:
    zone = epsg - 32600
    return zone * 6.0 - 183.0


# --- Web Mercator (EPSG:3857, spherical closed form) ---------------------------
def _merc_to_lonlat(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / WEB_MERCATOR_R)
    lat = np.degrees(
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / WEB_MERCATOR_R))
        - np.pi / 2.0
    )
    return lon, lat


def _merc_from_lonlat(lon, lat):
    x = WEB_MERCATOR_R * np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    y = WEB_MERCATOR_R * np.arctanh(np.sin(phi))
    return x, y


# --- Transverse Mercator (Krueger flattening series, order n^4) ----------------
_N = WGS84_F / (2.0 - WGS84_F)
_A_RECT = WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
# forward (geographic -> grid)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0 + 41.0 * _N**4 / 180.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0 + 557.0 * _N**4 / 1440.0,
    61.0 * _N**3 / 240.0 - 103.0 * _N**4 / 140.0,
    49561.0 * _N**4 / 161280.0,
)
# inverse (grid -> conformal)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0 - _N**4 / 360.0,
    _N**2 / 48.0 + _N**3 / 15.0 - 437.0 * _N**4 / 1440.0,
    17.0 * _N**3 / 480.0 - 37.0 * _N**4 / 840.0,
    4397.0 * _N**4 / 161280.0,
)
# conformal -> geographic latitude
_DELTA = (
    2.0 * _N - 2.0 * _N**2 / 3.0 - 2.0 * _N**3 + 116.0 * _N**4 / 45.0,
    7.0 * _N**2 / 3.0 - 8.0 * _N**3 / 5.0 - 227.0 * _N**4 / 45.0,
    56.0 * _N**3 / 15.0 - 136.0 * _N**4 / 35.0,
    4279.0 * _N**4 / 630.0,
)
_E2SN = 2.0 * np.sqrt(_N) / (1.0 + _N)  # 2*sqrt(n)/(1+n) in the conformal map


def tm_forward(lon, lat, lon0_deg: float, k0: float, fe: float, fn: float):
    """WGS84 Transverse Mercator forward: degrees -> grid meters."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _E2SN * np.arctanh(_E2SN * s))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xs, es = xi.copy(), eta.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xs += a * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        es += a * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    return fe + k0 * _A_RECT * es, fn + k0 * _A_RECT * xs


def tm_inverse(x, y, lon0_deg: float, k0: float, fe: float, fn: float):
    """WGS84 Transverse Mercator inverse: grid meters -> degrees."""
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * _A_RECT)
    xi = (np.asarray(y, dtype=np.float64) - fn) / (k0 * _A_RECT)
    xp, ep = xi.copy(), eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xp -= b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        ep -= b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    chi = np.arcsin(np.sin(xp) / np.cosh(ep))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2.0 * j * chi)
    lam = np.arctan2(np.sinh(ep), np.cos(xp))
    return lon0_deg + np.degrees(lam), np.degrees(phi)


def make_utm(zone: int, north: bool = True):
    """(to_lonlat, from_lonlat) callables for real WGS84 UTM — register under
    any code via ``register_crs(code, *make_utm(z, north), separable=False)``."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone {zone} out of range 1..60")
    lon0 = zone * 6.0 - 183.0
    fn = 0.0 if north else 10_000_000.0

    def to_ll(x, y, _lon0=lon0, _fn=fn):
        return tm_inverse(x, y, _lon0, 0.9996, 500_000.0, _fn)

    def from_ll(lon, lat, _lon0=lon0, _fn=fn):
        return tm_forward(lon, lat, _lon0, 0.9996, 500_000.0, _fn)

    return to_ll, from_ll


# --- dispatch ------------------------------------------------------------------
def is_separable(epsg: int) -> bool:
    proj = _REGISTRY.get(epsg)
    if proj is not None:
        return proj.separable
    if epsg == 4326 or epsg == 3857 or 32601 <= epsg <= 32660:
        return True
    if 32701 <= epsg <= 32760:
        return False
    raise ValueError(f"unregistered CRS {epsg}")


def to_lonlat(epsg: int, x, y):
    proj = _REGISTRY.get(epsg)
    if proj is not None:
        return proj.to_lonlat(x, y)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if epsg == 4326:
        return x, y
    if 32601 <= epsg <= 32660:  # linear synthetic zones (oracle-exact)
        return x / M_PER_DEG_X + utm_lon0(epsg), y / M_PER_DEG_Y
    if epsg == 3857:
        return _merc_to_lonlat(x, y)
    if 32701 <= epsg <= 32760:  # real UTM south
        return tm_inverse(x, y, (epsg - 32700) * 6.0 - 183.0, 0.9996, 500_000.0, 10_000_000.0)
    raise ValueError(f"unregistered CRS {epsg}")


def from_lonlat(epsg: int, lon, lat):
    proj = _REGISTRY.get(epsg)
    if proj is not None:
        return proj.from_lonlat(lon, lat)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if epsg == 4326:
        return lon, lat
    if 32601 <= epsg <= 32660:
        return (lon - utm_lon0(epsg)) * M_PER_DEG_X, lat * M_PER_DEG_Y
    if epsg == 3857:
        return _merc_from_lonlat(lon, lat)
    if 32701 <= epsg <= 32760:
        return tm_forward(lon, lat, (epsg - 32700) * 6.0 - 183.0, 0.9996, 500_000.0, 10_000_000.0)
    raise ValueError(f"unregistered CRS {epsg}")


# --- WKT2 spelling (CF/spatial_ref parity) -------------------------------------
_WKT_REGISTRY: dict[int, str] = {}


def register_crs_wkt(epsg: int, wkt: str) -> None:
    """Attach a WKT2 string to a (typically ``register_crs``-injected) code so
    assembled outputs can CF-spell it."""
    _WKT_REGISTRY[int(epsg)] = wkt


_WGS84_DATUM_WKT = (
    'DATUM["World Geodetic System 1984",'
    'ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],'
    'PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]'
)

_CARTESIAN_CS_WKT = (
    "CS[Cartesian,2],"
    'AXIS["easting (E)",east,ORDER[1],LENGTHUNIT["metre",1]],'
    'AXIS["northing (N)",north,ORDER[2],LENGTHUNIT["metre",1]]'
)


def crs_wkt(epsg: int) -> str:
    """WKT2 (ISO 19162) text for a CRS code — the engine's analogue of the
    reference's ``spatial_ref`` attrs (rasterio CRS WKT riding on assembled
    xarray output, `src/rasteret/core/raster_accessor.py:1328-1477`).

    Hand-written for the builtin families: 4326, 3857, real UTM south
    (327xx).  The synthetic linear zones (326xx) are spelled as what they
    ARE — an equidistant-cylindrical-style linear map declared in a REMARK —
    not as real Transverse Mercator, so a consumer is never misled about the
    math.  ``register_crs_wkt`` covers injected codes."""
    epsg = int(epsg)
    if epsg in _WKT_REGISTRY:
        return _WKT_REGISTRY[epsg]
    if epsg == 4326:
        return (
            'GEOGCRS["WGS 84",' + _WGS84_DATUM_WKT + ","
            "CS[ellipsoidal,2],"
            'AXIS["geodetic latitude (Lat)",north,ORDER[1],'
            'ANGLEUNIT["degree",0.0174532925199433]],'
            'AXIS["geodetic longitude (Lon)",east,ORDER[2],'
            'ANGLEUNIT["degree",0.0174532925199433]],'
            'ID["EPSG",4326]]'
        )
    if epsg == 3857:
        return (
            'PROJCRS["WGS 84 / Pseudo-Mercator",'
            'BASEGEOGCRS["WGS 84",' + _WGS84_DATUM_WKT + "],"
            'CONVERSION["Popular Visualisation Pseudo-Mercator",'
            'METHOD["Popular Visualisation Pseudo Mercator",ID["EPSG",1024]],'
            'PARAMETER["Latitude of natural origin",0,'
            'ANGLEUNIT["degree",0.0174532925199433]],'
            'PARAMETER["Longitude of natural origin",0,'
            'ANGLEUNIT["degree",0.0174532925199433]],'
            'PARAMETER["False easting",0,LENGTHUNIT["metre",1]],'
            'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],'
            + _CARTESIAN_CS_WKT + ','
            'ID["EPSG",3857]]'
        )
    if 32701 <= epsg <= 32760:  # real WGS84 UTM south (Krueger-series impl)
        zone = epsg - 32700
        lon0 = zone * 6 - 183
        return (
            f'PROJCRS["WGS 84 / UTM zone {zone}S",'
            'BASEGEOGCRS["WGS 84",' + _WGS84_DATUM_WKT + "],"
            f'CONVERSION["UTM zone {zone}S",'
            'METHOD["Transverse Mercator",ID["EPSG",9807]],'
            'PARAMETER["Latitude of natural origin",0,'
            'ANGLEUNIT["degree",0.0174532925199433]],'
            f'PARAMETER["Longitude of natural origin",{lon0},'
            'ANGLEUNIT["degree",0.0174532925199433]],'
            'PARAMETER["Scale factor at natural origin",0.9996,'
            'SCALEUNIT["unity",1]],'
            'PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],'
            'PARAMETER["False northing",10000000,LENGTHUNIT["metre",1]]],'
            + _CARTESIAN_CS_WKT + ','
            f'ID["EPSG",{epsg}]]'
        )
    if 32601 <= epsg <= 32660:  # engine-declared SYNTHETIC linear zones
        zone = epsg - 32600
        lon0 = zone * 6 - 183
        return (
            f'PROJCRS["rasteret-spark linear zone {zone}N '
            f'(synthetic analogue of EPSG:{epsg})",'
            'BASEGEOGCRS["WGS 84",' + _WGS84_DATUM_WKT + "],"
            f'CONVERSION["Linear equirectangular zone {zone}",'
            'METHOD["Equidistant Cylindrical",ID["EPSG",1028]],'
            f'PARAMETER["Longitude of natural origin",{lon0},'
            'ANGLEUNIT["degree",0.0174532925199433]],'
            'PARAMETER["False easting",0,LENGTHUNIT["metre",1]],'
            'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],'
            + _CARTESIAN_CS_WKT + ','
            'REMARK["engine-declared synthetic zone: x=(lon-lon0)*111320 m, '
            'y=lat*110540 m (exact linear math for oracle reproducibility, '
            "not real Transverse Mercator)\"],"
            f'ID["EPSG",{epsg}]]'
        )
    raise ValueError(f"no WKT2 spelling for CRS {epsg}; register_crs_wkt it")


def transform_points(src_epsg: int, dst_epsg: int, x, y):
    """Pointwise CRS-to-CRS transform via the lon/lat hub — the
    ``transform_coords`` analogue (rasteret `core/geometry.py:186-247`)."""
    lon, lat = to_lonlat(src_epsg, x, y)
    return from_lonlat(dst_epsg, lon, lat)


def transform_ring(src_epsg: int, dst_epsg: int, ring: np.ndarray) -> np.ndarray:
    """(n, 2) polygon ring between CRSs (vertices map pointwise; densify
    upstream if edge curvature matters for the use)."""
    ring = np.asarray(ring, dtype=np.float64)
    x, y = transform_points(src_epsg, dst_epsg, ring[:, 0], ring[:, 1])
    return np.stack([x, y], axis=1)


def transform_bbox(
    src_epsg: int,
    dst_epsg: int,
    bbox: tuple[float, float, float, float],
    density: int = 8,
) -> tuple[float, float, float, float]:
    """bbox between CRSs: densified boundary ring mapped pointwise, bounds
    taken in the destination — exact for separable pairs, curvature-safe for
    Transverse Mercator (the ``transform_bbox`` analogue)."""
    xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    t = np.linspace(0.0, 1.0, max(density, 2))
    xs = np.concatenate(
        [xmin + (xmax - xmin) * t, np.full_like(t, xmax), xmax + (xmin - xmax) * t, np.full_like(t, xmin)]
    )
    ys = np.concatenate(
        [np.full_like(t, ymin), ymin + (ymax - ymin) * t, np.full_like(t, ymax), ymax + (ymin - ymax) * t]
    )
    bx, by = transform_points(src_epsg, dst_epsg, xs, ys)
    return float(bx.min()), float(by.min()), float(bx.max()), float(by.max())


def bbox_from_lonlat(
    epsg: int,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    density: int = 8,
) -> tuple[float, float, float, float]:
    """lon/lat bbox -> bounding box in the target CRS.

    Separable CRS: the two corners bound exactly (per-axis monotone maps).
    Non-separable (Transverse Mercator): map a densified boundary ring —
    ``density`` samples per edge — so curved edges can't escape the window
    (the same densify-the-ring approach rasterio's transform_bounds uses).
    """
    if is_separable(epsg):
        bx, by = from_lonlat(epsg, np.array([xmin, xmax]), np.array([ymin, ymax]))
        return float(bx.min()), float(by.min()), float(bx.max()), float(by.max())
    t = np.linspace(0.0, 1.0, max(density, 2))
    lons = np.concatenate(
        [xmin + (xmax - xmin) * t, np.full_like(t, xmax), xmax + (xmin - xmax) * t, np.full_like(t, xmin)]
    )
    lats = np.concatenate(
        [np.full_like(t, ymin), ymin + (ymax - ymin) * t, np.full_like(t, ymax), ymax + (ymin - ymax) * t]
    )
    bx, by = from_lonlat(epsg, lons, lats)
    return float(bx.min()), float(by.min()), float(bx.max()), float(by.max())
