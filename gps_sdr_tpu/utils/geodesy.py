"""Geodetic coordinate transforms (WGS84).

Covers the reference's geodesy layer (src/gpslib.py:1795-1942):
ECEF <-> geodetic, ECEF -> local azimuth/elevation, and local
east/north offsets.  Implemented from the WGS84 ellipsoid definition
with standard methods (Bowring-style fixed-point iteration for the
inverse problem instead of the reference's Osen closed form — equal
accuracy at these magnitudes, trivially vectorizable).
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0                      # semi-major axis, m
WGS84_F = 1.0 / 298.257223563            # flattening
WGS84_B = WGS84_A * (1.0 - WGS84_F)      # semi-minor axis
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)     # first eccentricity squared

_D2R = np.pi / 180.0
_R2D = 180.0 / np.pi


def geo_to_ecef(lat_deg, lon_deg, alt_m):
    """Geodetic (degrees, meters) -> ECEF meters.  Broadcasts."""
    lat = np.asarray(lat_deg, np.float64) * _D2R
    lon = np.asarray(lon_deg, np.float64) * _D2R
    sl, cl = np.sin(lat), np.cos(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sl * sl)
    d = (n + alt_m) * cl
    return d * np.cos(lon), d * np.sin(lon), ((1.0 - WGS84_E2) * n
                                              + alt_m) * sl


def ecef_to_geo(xyz, n_iter: int = 8):
    """ECEF meters -> (lat_deg, lon_deg, alt_m).

    Fixed-point iteration on the geodetic latitude; 8 iterations give
    sub-micrometer height accuracy anywhere on/near Earth."""
    x, y, z = (np.asarray(v, np.float64) for v in xyz)
    p = np.hypot(x, y)
    lon = np.arctan2(y, x)
    lat = np.arctan2(z, p * (1.0 - WGS84_E2))
    n = WGS84_A
    h = 0.0
    for _ in range(n_iter):
        sl = np.sin(lat)
        n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sl * sl)
        h = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1.0 - WGS84_E2 * n / (n + h)))
    return lat * _R2D, lon * _R2D, h


def ecef_to_azim_elev(obs_xyz, sat_xyz):
    """Azimuth/elevation of a satellite seen from an ECEF observer.

    Returns (elev_deg, azim_deg), azimuth from north through east —
    the convention the reference's polar sky plot uses
    (gpslib.py:1897-1922).  Uses the local ENU basis at the observer's
    geodetic position."""
    obs = np.asarray(obs_xyz, np.float64)
    sat = np.asarray(sat_xyz, np.float64)
    lat, lon, _ = ecef_to_geo(obs)
    lat, lon = lat * _D2R, lon * _D2R
    sl, cl = np.sin(lat), np.cos(lat)
    so, co = np.sin(lon), np.cos(lon)
    d = sat - obs
    east = -so * d[0] + co * d[1]
    north = -sl * co * d[0] - sl * so * d[1] + cl * d[2]
    up = cl * co * d[0] + cl * so * d[1] + sl * d[2]
    elev = np.arcsin(up / np.linalg.norm(d)) * _R2D
    azim = np.arctan2(east, north) * _R2D
    return elev, azim


def enu_to_ecef_vec(lat_deg, lon_deg, enu):
    """Rotate a local east/north/up vector at (lat, lon) into ECEF
    (velocities, baselines — anything translation-free)."""
    lat = np.asarray(lat_deg, np.float64) * _D2R
    lon = np.asarray(lon_deg, np.float64) * _D2R
    sl, cl = np.sin(lat), np.cos(lat)
    so, co = np.sin(lon), np.cos(lon)
    e, n, u = (np.asarray(v, np.float64) for v in enu)
    return np.array([-so * e - sl * co * n + cl * co * u,
                     co * e - sl * so * n + cl * so * u,
                     cl * n + sl * u])


def local_offsets_m(geo_home, geo_pos):
    """(east_m, north_m) offset of geo_pos from geo_home (small
    distances); the track-plot projection (gpslib.py:1932-1942)."""
    lat0, lon0, _ = geo_home
    lat, lon, _ = geo_pos
    latr = np.asarray(lat0, np.float64) * _D2R
    sl = np.sin(latr)
    m_per_deg_lat = (WGS84_A * (1.0 - WGS84_E2)
                     / (1.0 - WGS84_E2 * sl * sl) ** 1.5 * _D2R)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sl * sl)
    m_per_deg_lon = n * np.cos(latr) * _D2R
    return ((np.asarray(lon) - lon0) * m_per_deg_lon,
            (np.asarray(lat) - lat0) * m_per_deg_lat)
