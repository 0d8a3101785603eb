"""Pseudorange assembly: code phases + time references -> satellite
positions and receive timestamps.

Replaces the reference's SatOrbit class (src/gpslib.py:801-1039).  This
is the time-bookkeeping heart of the receiver: a (tow, ST) reference
from a decoded subframe anchors the sample clock to GPS time; the
stream of per-block code phases is then walked forward TOW by TOW
(6 s = 187.5 blocks at n_cyc=32, hence the alternating 16 ms `offms`
parity, gpslib.py:987-1037), unwrapping code-phase overflows across
lists, bridging gaps with a linear fit, and estimating the code-phase
slope and sigma for the LSF weights (getStdDev, gpslib.py:864-883).

Output tuples match the reference exactly:
  (sat_no, tow, x, y, z, smp_time_s, week_num, cyc_no, coph_std_m)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gps_sdr_tpu.config import GPS_C, ReceiverConfig
from gps_sdr_tpu.models import orbits
from gps_sdr_tpu.models.ephemeris import EphemerisAssembler, SatStatus

MAX_SLOPE = 6.55e-3     # samples/ms; max physical code-phase drift
                        # (|doppler| <= 5 kHz -> 6.5 samples/s; gpslib.py:812)


def _linfit(x, y) -> tuple[float, float]:
    """Degree-1 least squares (slope, intercept) in f64 — the closed
    form; np.polyfit's generic Vandermonde/lstsq machinery costs ~10x
    more per call and this runs once per satellite per chunk."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    mx = x.mean()
    my = y.mean()
    dx = x - mx
    denom = float(dx @ dx)
    slope = float(dx @ (y - my)) / denom if denom else 0.0
    return slope, my - slope * mx


def max_slope(cfg: ReceiverConfig) -> float:
    """Code-phase slope cap [samples/ms] for this config's envelope.

    The reference's constant (gpslib.py:812) assumes geometric Doppler
    within +-5 kHz; an uncorrected receiver oscillator (its +-2 ppm
    TCXO envelope, README.md:204-217) adds a COMMON code-clock skew of
    ppm*fs samples/s on top, which the config expresses by widening the
    acquisition search band.  Clipping real slope into a too-small cap
    biases the per-code-period timestamp correction (corr_cp)
    differentially across satellites — a position bias — so the cap
    follows the configured band (+500 Hz drift margin between sweeps)
    and never drops below the reference's constant."""
    f_max = max(abs(cfg.min_freq), abs(cfg.max_freq)) + 500.0
    return max(MAX_SLOPE,
               f_max / 1540.0 * (cfg.code_samples / 1023.0) * 1e-3)


@dataclass
class DeferredRows:
    """One satellite's pseudorange bookkeeping, orbit propagation still
    pending — lets the evaluator batch ecef_coord across satellites."""

    sat_no: int
    week_num: int
    sigma: float
    ephem: dict
    rows: list              # (tow, delta_st, smp_raw, cyc_no)


def finish_deferred(deferred: list, cfg: ReceiverConfig,
                    rel_corr: bool = True) -> list:
    """Run ONE vectorized orbit propagation over every satellite's rows
    and emit the reference-format result tuples, grouped per satellite
    in input order.  All ecef_coord math is elementwise, so stacking
    rows across satellites is bit-identical to per-satellite calls."""
    if not deferred:
        return []
    fs = cfg.sample_rate
    counts = [len(d.rows) for d in deferred]
    tow_a = np.array([r[0] for d in deferred for r in d.rows], np.float64)
    dst_a = np.array([r[1] for d in deferred for r in d.rows], np.float64)
    eph = {k: np.repeat([d.ephem[k] for d in deferred], counts)
           for k in deferred[0].ephem
           if isinstance(deferred[0].ephem[k], (int, float, np.floating))}
    x, y, z, dtsv = orbits.ecef_coord(tow_a, eph, dt_from_tow=dst_a / fs,
                                      rel_corr=rel_corr)
    dtsv = np.broadcast_to(np.asarray(dtsv, np.float64), tow_a.shape)
    result = []
    i = 0
    for d in deferred:
        for (tw, _, smp_raw, cyc) in d.rows:
            result.append((d.sat_no, int(tw), float(x[i]), float(y[i]),
                           float(z[i]), smp_raw / fs + float(dtsv[i]),
                           d.week_num, int(cyc), d.sigma))
            i += 1
    return result


@dataclass
class PseudorangeEngine:
    """One satellite's code-phase -> pseudorange pipeline."""

    sat_no: int
    cfg: ReceiverConfig
    preloaded_ephem: dict | None = None

    status: SatStatus = SatStatus.OK
    asm: EphemerisAssembler = None
    ref_time: tuple | None = None        # active (tow, ST)
    ref_ephem: dict | None = None
    last_sno: int = 0
    last_cp: float = 0.0
    cp_hist: list = field(default_factory=list)     # [(sno, cp)] fit window
    slope_hist: list = field(default_factory=list)  # cp slopes per ms
    phase_err_snos: list = field(default_factory=list)

    MIN_GAP = 1000        # blocks; larger gaps bridged by linear fit
    MAX_GAP = 10000       # blocks; beyond this the reference is dropped
    MAX_FIT = 100         # fit window length
    DIFF_TOL = 200        # samples; overflow matching tolerance

    def __post_init__(self):
        if self.asm is None:
            self.asm = EphemerisAssembler(self.sat_no, self.preloaded_ephem)

    # -- subframe input -----------------------------------------------------

    def read_frame(self, sf: dict) -> SatStatus:
        """Feed a decoded subframe (readFrame, gpslib.py:848-861): frames
        predating a recorded phase error are rejected; an ephemeris
        change rebuilds the assembler and re-reads the subframe."""
        stream_no = sf["ST"] // self.cfg.ngps
        if self.phase_err_snos and stream_no < self.phase_err_snos[-1]:
            self.status = SatStatus.FLAWED
            return self.status
        self.status = self.asm.read_subframe(sf)
        if self.status == SatStatus.NEW_EPHEM:
            self.asm = EphemerisAssembler(self.sat_no)
            self.asm.read_subframe(sf)
        return self.status

    @property
    def ephem_ok(self) -> bool:
        return self.asm.ephem_ok

    @property
    def ephem(self) -> dict:
        return self.asm.ephem

    # -- internals ----------------------------------------------------------

    def _clear_ref(self):
        """Drop the code-phase continuity state (clearCodePhaseRef,
        gpslib.py:886-891)."""
        self.last_sno = 0
        self.cp_hist = []
        self.slope_hist = []
        self.ref_time = None
        self.ref_ephem = None

    def _sigma_and_slope(self, snos, cps) -> tuple[float, float]:
        """sigma of the code phases around a linear fit (meters) and the
        averaged, clipped slope in samples/ms (getStdDev,
        gpslib.py:864-883)."""
        if len(cps) > 3:
            p = _linfit(snos, cps)
            sigma = float(np.std(cps - (p[0] * snos + p[1])))
            self.slope_hist.append(p[0] / self.cfg.n_cyc)
            max_hist = 1024 // self.cfg.n_cyc
            if len(self.slope_hist) > max_hist:
                del self.slope_hist[0]
        else:
            sigma = 0.5
        sigma *= GPS_C / self.cfg.sample_rate
        slope = 0.0
        if len(self.slope_hist) > 4:
            slope = float(np.mean(self.slope_hist))
        cap = max_slope(self.cfg)
        return sigma, float(np.clip(slope, -cap, cap))

    # -- main entry ----------------------------------------------------------

    def eval_code_phases(self, cpl: list, rel_corr: bool = True,
                         defer: bool = False):
        """Code-phase list [(stream_no, code_phase), ...] -> result tuples.

        Mirrors evalCodePhase (gpslib.py:897-1039).  A leading
        (stream_no, None) entry is the global phase-error poison pill:
        it invalidates the time reference and excludes older frames.
        """
        cfg = self.cfg
        cs, ngps, n_cyc, fs = (cfg.code_samples, cfg.ngps, cfg.n_cyc,
                               cfg.sample_rate)
        six_sec = int(6 * fs)

        result: list = []
        if cpl:
            if cpl[0][1] is None:
                self.phase_err_snos.append(cpl[0][0])
                self.asm.time_refs = []
                self._clear_ref()
                return result
            cpl = [e for e in cpl if e[0] > self.last_sno]

        # an ephemeris update invalidates the anchored reference
        if (self.ref_time is not None and self.asm.ephem_ok
                and self.asm.ephem["IODC"] != self.ref_ephem["IODC"]):
            self._clear_ref()

        if self.ref_time is None and self.asm.time_refs:
            self.ref_time = self.asm.time_refs[-1]
            self.ref_ephem = dict(self.asm.ephem)

        if not cpl or self.ref_time is None:
            return result

        week_num = self.ref_ephem["weekNum"]
        tow, st_raw = self.ref_time
        st_frac = st_raw % cs                 # sub-period part ~ code phase
        st = (st_raw // cs) * cs              # snap to a code-period boundary
        if st // ngps > self.last_sno:
            self.last_sno = st // ngps
            self.last_cp = st_frac

        snos = np.array([e[0] for e in cpl], dtype=np.int64)
        cps = np.array([e[1] for e in cpl], dtype=np.float64)

        # bridge or reject gaps since the last processed stream
        gap = int(snos[0]) - self.last_sno
        if gap > self.MAX_GAP:
            self._clear_ref()
            return result
        if gap > self.MIN_GAP:
            if len(self.cp_hist) >= n_cyc // 2:
                hx, hy = zip(*self.cp_hist[-self.MAX_FIT:])
                sl, ic = _linfit(hx, hy)
                self.last_cp = float(sl * snos[0] + ic)
            else:
                self._clear_ref()
                return result

        # overflow continuation: code phases within a list were already
        # unwrapped upstream (runtime/evaluator.py); align this list's
        # offset with the running unwrap
        ofl = self.last_cp // cs
        if ofl != 0:
            cps = cps + ofl * cs
        diff = self.last_cp - cps[0]
        if abs(abs(diff) - cs) <= self.DIFF_TOL:
            cps = cps + np.sign(diff) * cs

        sigma, slope = self._sigma_and_slope(snos, cps)
        self.cp_hist += list(zip(snos.tolist(), cps.tolist()))
        self.cp_hist = self.cp_hist[-self.MAX_FIT:]
        self.last_sno, self.last_cp = int(snos[-1]), float(cps[-1])

        # TOW walking: 6 s = 6000 code periods = 187.5 blocks (n_cyc=32),
        # so each TOW epoch starts offms ms into a block, alternating by
        # 16 ms (gpslib.py:987-1037)
        offms = (tow % 2 ** (n_cyc // 32)) * 16 if n_cyc > 16 else 0
        while (st + six_sec) // ngps < snos[0]:
            st += six_sec
            tow += 1
            offms = (offms + 16) % n_cyc

        cp = cps[0]
        cyc_no = 0
        delta_st = offms * cs
        stream_no = (st + delta_st) // ngps
        code_no = (st + delta_st) // cs - stream_no * n_cyc
        idx = 0
        # Walk the bookkeeping first, collecting one row per matched
        # stream; the Kepler propagation then runs ONCE vectorized over
        # all rows (orbits.ecef_coord broadcasts) instead of per code
        # phase like the reference (gpslib.py:1011) — ~10x cheaper on
        # the host, bit-identical results.
        rows: list = []                # (tow, delta_st, st, cp, cyc_no)
        while idx < len(snos):
            if snos[idx] < stream_no:
                idx += 1
            elif snos[idx] > stream_no:
                stream_no += 1
                cyc_no += 1
                delta_st += ngps
            else:
                cp = cps[idx]
                # the correlator measures at the block center; shift the
                # timestamp by the code-phase slope times the offset of
                # this code period from the center
                corr_cp = (code_no + cp // cs - n_cyc // 2) * slope
                rows.append((tow, delta_st, st + delta_st + cp + corr_cp,
                             cyc_no))
                stream_no += 1
                cyc_no += 1
                delta_st += ngps
                idx += 1

            if delta_st >= six_sec:
                tow += 1
                cyc_no = 0
                st += six_sec
                offms = (offms + 16) % n_cyc
                delta_st = offms * cs
                # roll the anchor forward so the next call doesn't rewalk
                if stream_no < snos[-1]:
                    self.ref_time = (tow, int(st + cp % cs))

        if rows:
            if defer:
                # cross-satellite orbit batching: hand the bookkeeping
                # back so the evaluator can run ONE vectorized
                # ecef_coord over every satellite's rows (elementwise
                # math -> bit-identical to the per-sat call)
                return DeferredRows(self.sat_no, int(week_num), sigma,
                                    dict(self.ref_ephem), rows)
            tow_a = np.array([r[0] for r in rows], dtype=np.float64)
            dst_a = np.array([r[1] for r in rows], dtype=np.float64)
            x, y, z, dtsv = orbits.ecef_coord(
                tow_a, self.ref_ephem, dt_from_tow=dst_a / fs,
                rel_corr=rel_corr)
            dtsv = np.broadcast_to(np.asarray(dtsv, np.float64),
                                   tow_a.shape)
            for i, (tw, _, smp_raw, cyc) in enumerate(rows):
                result.append((self.sat_no, int(tw), float(x[i]),
                               float(y[i]), float(z[i]),
                               smp_raw / fs + float(dtsv[i]),
                               int(week_num), int(cyc), sigma))

        return result
