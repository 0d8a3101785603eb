"""Position fixing: iterated weighted Gauss-Newton least squares.

Replaces the reference's leastSquaresPos family (src/gpslib.py:1641-1791).
Solves for receiver position and the propagation time of satellite 0
from *relative* pseudoranges — time delays are differenced against
satellite 0 and a clock unknown t0 absorbs the common bias
(gpslib.py:1701-1703), exactly the reference's formulation:

  minimize || range_i(pos) - c*t0 - c*(d_i - d_0) ||_W

with the Sagnac (earth-rotation during signal flight) displacement
applied to the satellite positions each iteration (rotEarth,
gpslib.py:1670-1675), optional 1/sigma^2 weighting, and an optional
WGS84-ellipsoid height constraint enabling 3-satellite fixes
(gpslib.py:1740-1791).

Host float64.  The solve is a handful of 4x4 normal equations per
second — bookkeeping next to the IQ stream.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from gps_sdr_tpu.config import GPS_C, OMEGA_EARTH
from gps_sdr_tpu.utils.geodesy import WGS84_A, WGS84_F


class FixResult(NamedTuple):
    rec_pos: np.ndarray     # [4]: (c*t0 in m, x, y, z)
    residual: float         # norm of the final update step
    range_est: np.ndarray   # [n] estimated geometric ranges, m
    meas_delay: np.ndarray  # [n] measured propagation distances, m
    n_iter: int


def _sagnac(rec_pos: np.ndarray, range_est: np.ndarray) -> np.ndarray:
    """Satellite displacement due to earth rotation during signal flight:
    dp[:, i] = omega x r_rec * (range_i / c) (rotEarth, gpslib.py:1670-75)."""
    dt = range_est / GPS_C
    v = np.array([-rec_pos[2] * OMEGA_EARTH, rec_pos[1] * OMEGA_EARTH, 0.0])
    return np.outer(v, dt)


def solve_fix(sat_pos: np.ndarray, time_delay: np.ndarray,
              std_dev: np.ndarray | None = None,
              rec_pos0: np.ndarray | None = None,
              max_it: int = 15, max_residual: float = 1.0e-8,
              t0_guess: float = 0.07,
              height: float | None = None,
              height_dev: float = 1.0) -> FixResult:
    """Weighted Gauss-Newton position fix.

    sat_pos: float64[3, n] satellite ECEF positions at transmit time;
    time_delay: float64[n] receive timestamps (s, receiver clock);
    std_dev: per-satellite sigma in meters (weights 1/sigma^2) or None;
    height: if given, adds the WGS84 height constraint row (3-sat mode,
    the reference's leastSquaresPos3).

    Returns rec_pos = [c*t0, x, y, z] with t0 the propagation time of
    satellite 0; meas_delay = c*(d - d_0) + c*t0 are per-satellite
    propagation distances.
    """
    sat_pos = np.asarray(sat_pos, np.float64)
    n = sat_pos.shape[1]
    cdt = GPS_C * (np.asarray(time_delay, np.float64) - time_delay[0])

    pos = np.zeros(4) if rec_pos0 is None else np.array(rec_pos0, np.float64)
    pos[0] = GPS_C * t0_guess

    use_height = height is not None
    ab2 = 1.0 / (1.0 - WGS84_F) ** 2
    if use_height and pos[1] == 0 and pos[2] == 0:
        pos[1] = pos[2] = 3687000.0
    if use_height:
        r2 = (WGS84_A + height) ** 2 - pos[1] ** 2 - pos[2] ** 2
        pos[3] = (1.0 - WGS84_F) * np.sqrt(max(r2, 0.0))

    m = n + (1 if use_height else 0)
    if std_dev is None:
        w = np.ones(m)
    else:
        s = np.asarray(std_dev, np.float64)
        if use_height:
            s = np.append(s, height_dev)
        w = 1.0 / np.maximum(s, 1e-6) ** 2

    dp = np.zeros((3, n))
    residual = np.inf
    it = 0
    while it < max_it and residual > max_residual:
        diff = sat_pos - pos[1:4, None] - dp
        range_est = np.sqrt(np.sum(diff * diff, axis=0))
        dp = _sagnac(pos, range_est)

        fgn = np.empty(m)
        fgn[:n] = range_est - pos[0] - cdt
        jac = np.empty((m, 4))
        jac[:n, 0] = -1.0
        jac[:n, 1:] = ((pos[1:4, None] - sat_pos) / range_est).T
        if use_height:
            r_ell = np.sqrt(pos[1] ** 2 + pos[2] ** 2 + ab2 * pos[3] ** 2)
            fgn[n] = r_ell - (WGS84_A + height)
            jac[n] = [0.0, pos[1] / r_ell, pos[2] / r_ell,
                      ab2 * pos[3] / r_ell]

        jtw = jac.T * w
        delta = -np.linalg.pinv(jtw @ jac) @ (jtw @ fgn)
        pos = pos + delta
        residual = float(np.linalg.norm(delta))
        it += 1

    return FixResult(rec_pos=pos, residual=residual, range_est=range_est,
                     meas_delay=cdt + pos[0], n_iter=it)
