"""Execute the ACTUAL reference implementation on a capture file.

This script imports the upstream sources at /root/reference/src (read-only)
and drives them exactly the way the reference's own entry points do:

  * acquisition : gpsrecv.sweepAllSats        (gpsrecv.py:241-275, 474-492)
  * tracking    : gpslib.SatStream.process    (gpslib.py:1141-1210)
  * decode      : gpslib.Subframe via evalEdges (inside SatStream)
  * evaluation  : gpseval.prepCodePhase / evalData / ecefPositions /
                  ecefStatistics               (gpseval.py:530-560)

No reference logic is reimplemented here -- every algorithmic step runs
the imported upstream functions; this file only owns the glue the
reference keeps in its asyncio/UDP/multiprocessing plumbing (buffer
pull, per-second packet assembly, state threading), mirroring
gpsrecv.processData (gpsrecv.py:445-541) and gpseval.processData
(gpseval.py:462-585).

Run as a subprocess (module stubs below would pollute a shared
interpreter):

    python tests/ref_driver.py CAPTURE.bin OUT.pkl [--max-streams N]

The capture is the repo's packed uint16 IQ format, identical to what
the reference's streamData expects (gpsrecv.py:160-170).

Output pickle dict:
  found    : [(normMaxCorr, satNo, freq, delay), ...] from the sweep
  frames   : list of decoded subframe dicts (reference field names)
  coph     : {satNo: [(streamNo, codePhase), ...]} raw tracking output
  fixes    : [[posix_time, x, y, z], ...] accepted least-squares fixes
  stat     : (mean_xyz, dev_xyz, n, n_outliers) final position stats
  n_streams, sweep_streams : stream accounting
"""

import argparse
import pickle
import sys
import types

import numpy as np

REF_SRC = "/root/reference/src"


def _install_stubs():
    """Stub hardware/UI-only imports so the reference modules load
    headless: rtlsdr (gpsrecv.py:11), matplotlib/gpsui/gpxpy
    (gpseval.py:5-18).  Only processData/live paths touch them; none
    of the functions executed here do."""
    rtl = types.ModuleType("rtlsdr")
    rtl.RtlSdr = object
    sys.modules.setdefault("rtlsdr", rtl)

    mpl = types.ModuleType("matplotlib")
    mpl.use = lambda *a, **k: None
    plt = types.ModuleType("matplotlib.pyplot")
    plt.ion = lambda *a, **k: None
    plt.close = lambda *a, **k: None
    mpl.pyplot = plt
    sys.modules["matplotlib"] = mpl
    sys.modules["matplotlib.pyplot"] = plt

    ui = types.ModuleType("gpsui")
    ui.GpsUI = object
    sys.modules["gpsui"] = ui
    sys.modules.setdefault("gpxpy", types.ModuleType("gpxpy"))


def run_reference(capture_path: str, max_streams: int | None = None,
                  max_sat: int | None = None, n_cyc: int = 32) -> dict:
    _install_stubs()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    if n_cyc != 32:
        # the reference's supported reconfiguration is editing
        # gpsglob.py (N_CYC "currently possible are (32,16,8)",
        # gpsglob.py:122); gpslib/gpsrecv/gpseval star-copy the globals
        # at import, so patch gpsglob BEFORE their first import.  NGPS
        # is the only derived constant (gpsglob.py:125); CORR_AVG must
        # stay <= N_CYC (gpsglob.py:63).
        import gpsglob
        gpsglob.N_CYC = n_cyc
        gpsglob.NGPS = n_cyc * gpsglob.CODE_SAMPLES
        gpsglob.CORR_AVG = min(gpsglob.CORR_AVG, n_cyc)
        for m in ("gpslib", "gpsrecv", "gpseval"):
            assert m not in sys.modules, f"{m} imported before patch"
    import gpslib
    import gpsrecv
    import gpseval
    from scipy.fft import fft

    NGPS = gpslib.NGPS

    # sweepAllSats reads the module-global FFT_CACODE that gpsrecv's
    # __main__ block builds (gpsrecv.py:570-575); build it the same way.
    gpsrecv.FFT_CACODE = [0, 0] + [fft(gpslib.GPSCacode(s))
                                   for s in range(2, 33)]

    raw = np.fromfile(capture_path, dtype=np.uint16)
    n_streams = len(raw) // NGPS
    if max_streams is not None:
        n_streams = min(n_streams, max_streams)

    def stream(k):
        # uint16 -> complex64 unpack exactly as streamData,
        # gpsrecv.py:166-168
        byte_data = raw[k * NGPS:(k + 1) * NGPS]
        im, re = np.divmod(byte_data, 256)
        return np.asarray(re + 1j * im, dtype=np.complex64) / 127.5 - (1 + 1j)

    # ---- phase 1: global acquisition sweep (gpsrecv.py:474-492) ----
    smp_time = np.int64(0)
    k = 0
    freq = gpsrecv.MIN_FREQ
    sat_lst = gpsrecv.SAT_ALL.copy()
    found: list = []
    sweep_ready = False
    while not sweep_ready and k < n_streams:
        data = stream(k)
        smp_time += NGPS
        k += 1
        sweep_ready, freq, found = gpsrecv.sweepAllSats(
            data, freq, sat_lst, found, itSweep=gpsrecv.IT_SWEEP_ALL)
    sweep_streams = k
    limit = gpsrecv.MAX_SAT if max_sat is None else max_sat
    found = found[:limit]           # getNewSats cap, gpsrecv.py:433-434

    # ---- phase 2: tracking (satCalc loop, gpsrecv.py:496-521) ----
    # The reference farms SatStream instances out to a process pool;
    # they share no state, so running them sequentially in-process is
    # behavior-identical and deterministic.
    sat_streams = {}
    for _corr, sat_no, fr, delay in found:
        sat_streams[sat_no] = gpslib.SatStream(
            sat_no, fr, delay=delay, itSweep=gpsrecv.IT_SWEEP,
            corrMin=gpsrecv.CORR_MIN, corrAvg=gpsrecv.CORR_AVG,
            sweepCorrAvg=gpsrecv.SWEEP_CORR_AVG)

    packets = []                    # per-second (skipData, frameLst, coPhLst)
    coph: dict = {}
    while k < n_streams:
        data = stream(k)
        smp_time += NGPS
        k += 1
        stream_no = smp_time // NGPS
        frame_lst: list = []
        for sat_no in sat_streams:
            _swfq, flst, co_ph, _cpq = sat_streams[sat_no].process(
                data, smp_time)
            frame_lst += flst
            if co_ph >= 0:
                coph.setdefault(sat_no, []).append((stream_no, co_ph))
        if len(frame_lst) > 0:      # once per second, gpsrecv.py:510-521
            packets.append((0, frame_lst, coph))
            coph = {}

    # ---- phase 3: evaluation (gpseval.processData, gpseval.py:530-560) ----
    frames_all: list = []
    coph_all: dict = {}
    fixes: list = []
    no_phase_err = 0
    ecef_all_pos: list = []
    ecef_pos_stat = None
    last_pos_time = None
    err_lst: dict = {}
    swp_lst: dict = {}
    for _skip, frame_lst, coph_lst in packets:
        cpl, no_phase_err = gpseval.prepCodePhase(coph_lst, no_phase_err)
        sat_res, err_lst, swp_lst, _act, _t = gpseval.evalData(
            frame_lst, cpl, err_lst, swp_lst)
        _sat_pos, rec_pos, _fail = gpseval.ecefPositions(
            sat_res, ecef_pos_stat)
        if len(rec_pos) > 0:
            ecef_pos_stat, ecef_all_pos, rec_pos, last_pos_time = \
                gpseval.ecefStatistics(ecef_pos_stat, ecef_all_pos,
                                       rec_pos, last_pos_time)
        fixes += [list(map(float, p)) for p in rec_pos]
        frames_all += [dict(sf) for sf in frame_lst if "ID" in sf]
        for s in coph_lst:
            coph_all.setdefault(s, []).extend(
                (int(n), float(cp)) for n, cp in coph_lst[s])

    stat = None
    if ecef_pos_stat is not None:
        mean, dev, n, n_out = ecef_pos_stat
        stat = (list(map(float, mean)), list(map(float, dev)),
                int(n), int(n_out))

    return {
        "found": [(float(c), int(s), float(f), int(d))
                  for c, s, f, d in found],
        "frames": frames_all,
        "coph": coph_all,
        "fixes": fixes,
        "stat": stat,
        "n_streams": int(n_streams),
        "sweep_streams": int(sweep_streams),
        # gpseval.prepCodePhase's correlated phase-error counter — the
        # recovery machinery the degraded-capture differential asserts
        # fires on BOTH pipelines (gpseval.py:436-457)
        "n_phase_errors": int(no_phase_err),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("capture")
    ap.add_argument("out")
    ap.add_argument("--max-streams", type=int, default=None)
    ap.add_argument("--n-cyc", type=int, default=32)
    args = ap.parse_args()
    res = run_reference(args.capture, args.max_streams,
                        n_cyc=args.n_cyc)
    with open(args.out, "wb") as f:
        pickle.dump(res, f)
    print(f"reference run: {res['n_streams']} streams, "
          f"{len(res['found'])} sats, {len(res['frames'])} subframes, "
          f"{len(res['fixes'])} fixes")


if __name__ == "__main__":
    main()
