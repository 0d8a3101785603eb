"""Benchmark: acquisition + 12-channel tracking real-time factor per chip.

The reference's performance envelope is "up to 12 satellites in real
time" at 2.048 MS/s on a multicore CPU (reference README.md:23-24) =>
baseline real-time factor 1.0.  This bench measures the same workload
on one accelerator chip:

  * cold-start acquisition: full 31-PRN x 51-Doppler x 2048-code-phase
    grid on one 32 ms block (one batched MXU program, ops/acquisition.py)
  * streaming tracking: 12 channels through the jitted scan
    (ops/tracking.py) over device-resident IQ, staged as
    synthesize-chunk -> track-chunk with no host round-trip of samples —
    exactly how a production deployment feeds the receiver from a
    device-resident capture/DMA buffer.

The deployment tunnel to the chip has seconds of fixed per-call
latency, so tracking is measured at two stream lengths and the fixed
overhead removed by differencing (standard amortized throughput).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline is the speedup over the reference's real-time factor 1.0.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import os  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402

if os.environ.get("BENCH_CPU"):
    # smoke-test mode: the axon plugin ignores JAX_PLATFORMS, force it
    jax.config.update("jax_platforms", "cpu")

from gps_sdr_tpu.utils.profiling import enable_compile_cache  # noqa: E402

enable_compile_cache()
import jax.numpy as jnp  # noqa: E402

from gps_sdr_tpu.config import ReceiverConfig  # noqa: E402
from gps_sdr_tpu.models.simulator import SatSignal, random_bits  # noqa: E402
from gps_sdr_tpu.models.sim_jax import JaxSynth  # noqa: E402
from gps_sdr_tpu.ops import cacode  # noqa: E402
from gps_sdr_tpu.ops.acquisition import acquire  # noqa: E402
from gps_sdr_tpu.ops.tracking import (init_channel_states,  # noqa: E402
                                      reset_channel, summarize_states,
                                      to_f32_pairs, track_chunk_batched)

N_CHANNELS = 12

# fused step size; any K is sequential-equivalent (virtual NCO retune,
# ops/tracking.py). K=32 measured best on one v5e with bf16 wipeoff
# matmuls (single-call 1980x vs 1713x at K=16: halves the scan-step +
# pallas-call count).
BLOCKS_PER_STEP = int(os.environ.get("BENCH_K", "32"))

if os.environ.get("BENCH_BF16"):
    # bf16 matmul inputs (f32 accumulation) for the DFT correlation —
    # trace-time flag, must be set before the first compile
    from gps_sdr_tpu.ops import dft as _dftmod
    _dftmod.BF16_MATMUL = True


class _Skip(Exception):
    """Raised to skip a deselected bench extra (BENCH_EXTRAS)."""


def _fail(e: Exception) -> str:
    """Stress-extra failure marker; full traceback goes to stderr."""
    import traceback
    traceback.print_exc(file=sys.stderr)
    return f"failed: {type(e).__name__}: {e}"


def force_f32(x) -> float:
    """Synchronize on a device value via an f32-safe scalar download
    (the deployment tunnel transfers only f32)."""
    return float(np.asarray(jnp.real(x).astype(jnp.float32).sum()))


def fresh_states(cfg, sats):
    states = init_channel_states(cfg, N_CHANNELS)
    for i, s in enumerate(sats):
        states = reset_channel(states, i, s.prn, s.doppler,
                               int(s.code_delay) % cfg.code_samples, cfg)
    return states


def host_probe_ms(reps: int = 3) -> float:
    """Fixed numpy+Python workload wall time in ms.

    The deployment host has ONE burstable core whose credit state swings
    host-bound metrics (full_loop, serving) ~2x run-to-run; this probe
    makes that state visible in every BENCH artifact so a genuine
    host-path regression is attributable at a glance.  The mix mirrors
    the evaluator's op shapes: small batched f64 matmul/solve,
    transcendentals, and plain interpreter overhead."""
    rng = np.random.default_rng(42)
    a = rng.normal(size=(256, 8, 4))
    v = rng.normal(size=(256, 8))
    big = rng.normal(size=200_000)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        m = a.transpose(0, 2, 1) @ a + np.eye(4)
        rhs = a.transpose(0, 2, 1) @ v[:, :, None]
        np.linalg.solve(m, rhs)
        np.sqrt(np.abs(np.sin(big))).sum()
        acc = 0
        for i in range(20_000):
            acc += i & 7
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    probe_start_ms = host_probe_ms()
    cfg = ReceiverConfig(max_sat=N_CHANNELS,
                         blocks_per_step=BLOCKS_PER_STEP,
                         use_pallas_kernels=jax.default_backend() == "tpu",
                         use_pallas_cheap=jax.default_backend() == "tpu")
    t_small = int(os.environ.get("BENCH_TSMALL", "512"))
    t_large = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    rng = np.random.default_rng(0)
    prns = rng.choice(np.arange(2, 33), N_CHANNELS, replace=False)
    sats = [SatSignal(prn=int(p),
                      doppler=float(rng.uniform(-4500, 4500)),
                      code_delay=float(rng.uniform(0, 2048)),
                      amplitude=float(rng.uniform(0.8, 1.2)),
                      nav_bits=random_bits(8192, seed=i))
            for i, p in enumerate(prns)]
    synth = JaxSynth(cfg, sats, noise_std=0.7, seed=1)
    tab, ftab = cacode.ca_table(cfg), cacode.ca_fft_table(cfg)
    codes = jnp.asarray(np.stack([tab[s.prn] for s in sats]))
    ffts = jnp.asarray(to_f32_pairs(np.stack([ftab[s.prn] for s in sats])))

    # --- acquisition: one full-grid call (compile, then time) ---
    blk1 = synth.chunk_planar(0, 1)
    force_f32(blk1)
    dopplers = jnp.asarray(cfg.doppler_bins, dtype=np.float32)
    all_ffts = jnp.asarray(to_f32_pairs(ftab[np.asarray(cfg.prns)]))
    res = acquire(cfg, blk1[0], dopplers, all_ffts)
    force_f32(res.norm_max)
    t0 = time.perf_counter()
    for _ in range(3):
        res = acquire(cfg, blk1[0], dopplers, all_ffts)
        force_f32(res.norm_max)
    acq_wall_ms = (time.perf_counter() - t0) / 3 * 1e3
    n_found = int(np.asarray(res.found).sum())

    # --- device-side synthesis rate (separate from the receiver) ---
    blk_small = synth.chunk_planar(0, t_small)
    force_f32(blk_small)
    t0 = time.perf_counter()
    blk_small = synth.chunk_planar(0, t_small)
    force_f32(blk_small)
    synth_wall = time.perf_counter() - t0

    def run_track(blocks, t):
        states = fresh_states(cfg, sats)
        t0 = time.perf_counter()
        states, outs = track_chunk_batched(cfg, states, blocks,
                                           jnp.float32(1), codes, ffts)
        force_f32(outs.code_phase)
        return time.perf_counter() - t0, states, outs

    # --- tracking at two sizes; difference removes fixed call latency,
    #     min-of-3 removes the one-sided tunnel latency spikes (+-60 ms,
    #     large vs the ~100 ms deltas being measured) ---
    pallas_fallback = False
    try:
        run_track(blk_small, t_small)                 # compile
    except Exception as e:
        # the shared tunnel backend intermittently rejects Pallas
        # executables (INVALID_ARGUMENT) after an earlier crash/OOM on
        # the remote worker; the XLA path still runs — degrade so the
        # bench reports a number instead of dying
        if not cfg.use_pallas_kernels:
            raise
        print(f"pallas path failed ({type(e).__name__}); falling back "
              f"to the XLA path", file=sys.stderr)
        cfg = cfg.replace(use_pallas_kernels=False, use_pallas_cheap=False)
        pallas_fallback = True
        run_track(blk_small, t_small)                 # compile
    w_small = min(run_track(blk_small, t_small)[0] for _ in range(5))
    blk_large = None
    while True:                   # worker-crash / HBM-exhaustion fallback
        try:
            blk_large = synth.chunk_planar(0, t_large)
            force_f32(blk_large)
            run_track(blk_large, t_large)             # compile at this shape
            wl_trials = []
            for _ in range(5):
                w2, st2, outs2 = run_track(blk_large, t_large)
                wl_trials.append(w2)
            w_large = min(wl_trials)                  # tunnel-noise floor
            break
        except Exception as e:
            if t_large <= 2 * t_small:
                raise
            t_large //= 2
            # free the failed chunk (an 8192-block planar chunk is
            # ~4.3 GB of HBM) before allocating the retry size
            if blk_large is not None:
                blk_large.delete()
                blk_large = None
            print(f"large run failed ({type(e).__name__}); retrying with "
                  f"{t_large} blocks", file=sys.stderr)
            time.sleep(10)

    # third size for a least-squares wall-vs-blocks slope: the
    # two-point difference sits ~100 ms against +-60 ms tunnel spikes,
    # so the slope over three sizes is the trustworthy rate
    t_mid = t_large // 4
    w_mid = min(run_track(blk_large[:t_mid], t_mid)[0] for _ in range(3))

    sig_small = t_small * cfg.block_sec
    sig_large = t_large * cfg.block_sec
    rtf_raw = sig_large / w_large
    rtf_amortized = (sig_large - sig_small) / max(w_large - w_small, 1e-9)
    # per-trial amortized RTFs: the variance the single number hides.
    # track_32ch has measured 949 and 3808 through the same tunnel
    # hours apart — a round-over-round delta is only attributable with
    # the spread published next to the median.
    rtf_t = sorted((sig_large - sig_small) / max(w - w_small, 1e-9)
                   for w in wl_trials)
    rtf_trials = {"median": round(float(np.median(rtf_t)), 1),
                  "min": round(rtf_t[0], 1), "max": round(rtf_t[-1], 1),
                  "n": len(rtf_t)}
    sizes = np.array([t_small, t_mid, t_large], np.float64)
    walls = np.array([w_small, w_mid, w_large], np.float64)
    sec_per_block = np.polyfit(sizes, walls, 1)[0]
    rtf_slope = cfg.block_sec / max(sec_per_block, 1e-12)

    # trace-derived DEVICE-time RTF: per-op device durations from the
    # profiler are exact and tunnel-noise-free — the only number that
    # can back an optimization claim below the +-60 ms wall noise
    rtf_device = None
    dev_info = None
    try:
        import shutil
        import tempfile

        from gps_sdr_tpu.utils.profiling import device_time_from_trace
        from gps_sdr_tpu.utils.profiling import trace as _trace
        tdir = tempfile.mkdtemp(prefix="bench_trace_")
        with _trace(tdir):
            run_track(blk_large, t_large)
        dev_info = device_time_from_trace(tdir)
        shutil.rmtree(tdir, ignore_errors=True)
        if dev_info["busy_s"] > 0:
            rtf_device = sig_large / dev_info["busy_s"]
    except Exception as e:
        print(f"device trace failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    # the headline chunks are done — free their ~4.6 GB of HBM so the
    # stress extras (16 streams x 512 blocks is another ~4.3 GB) fit
    blk_large.delete()
    blk_small.delete()

    # --- stress configurations (BASELINE.md): wide grid, 32 channels,
    #     16 MS/s front end.  Best-effort extras; never fail the bench.
    #     BENCH_EXTRAS selects a comma-separated subset (default all):
    #     widegrid,snapshot,ch32,streams,fullloop,serving,ncyc8,msps16
    _extras = set(os.environ.get("BENCH_EXTRAS", "all").split(","))

    def want(name: str) -> bool:
        return "all" in _extras or name in _extras

    stress = {}
    try:
        if not want("widegrid"):
            raise _Skip
        wide = cfg.replace(min_freq=-10000.0, max_freq=10000.0)
        dw = jnp.asarray(wide.doppler_bins, dtype=np.float32)
        res_w = acquire(wide, blk1[0], dw, all_ffts)
        force_f32(res_w.norm_max)
        t0 = time.perf_counter()
        res_w = acquire(wide, blk1[0], dw, all_ffts)
        force_f32(res_w.norm_max)
        stress["acq_31prn_pm10khz_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
    except _Skip:
        pass
    except Exception as e:
        stress["acq_31prn_pm10khz_ms"] = _fail(e)
    try:
        if not want("snapshot"):
            raise _Skip
        # coarse-time snapshot fix (ops/snapshot.py): full acquisition
        # grid on-chip + 5-unknown host solve from a 50 km / 20 s
        # prior — the whole time-to-first-fix, vs the reference's
        # ~30 s of decoded subframes
        from gps_sdr_tpu.models.scenario import (make_scenario,
                                                 synth_scenario_blocks)
        from gps_sdr_tpu.ops.snapshot import snapshot_fix
        scn_s = make_scenario(cfg, n_sats=7, duration_sec=4.0, seed=11)
        # cache key carries every parameter the cached block depends
        # on — a bare version string would go stale silently if the
        # bench cfg or scenario params drift
        snap_cache = (".synth_cache/bench_snapshot"
                      f"_g{cfg.ngps}_s7_seed11_n0.6.npy")
        if os.path.exists(snap_cache):
            snap_blk = np.load(snap_cache)
        else:
            snap_blk = synth_scenario_blocks(scn_s, 8, 1, noise_std=0.6,
                                             seed=7)[0]
            os.makedirs(".synth_cache", exist_ok=True)
            np.save(snap_cache, snap_blk)
        ephs_s = {s.prn: s.eph for s in scn_s.sats}
        t_rx_s = scn_s.t_rx0 + 8 * cfg.ngps / cfg.sample_rate
        prior_s = scn_s.rec_ecef + np.array([30e3, -30e3, 20e3])
        snap = snapshot_fix(cfg, snap_blk, ftab, ephs_s,
                            t_rx_s - 20.0, prior_s)       # compile
        t0 = time.perf_counter()
        snap = snapshot_fix(cfg, snap_blk, ftab, ephs_s,
                            t_rx_s - 20.0, prior_s)
        stress["snapshot_ttff_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        stress["snapshot_err_m"] = round(float(np.linalg.norm(
            snap.rec_pos - scn_s.rec_ecef)), 1)
    except _Skip:
        pass
    except Exception as e:
        stress["snapshot_ttff_ms"] = _fail(e)
    try:
        if not want("ch32"):
            raise _Skip
        n32 = 32
        cfg32 = cfg.replace(max_sat=n32)
        prns32 = np.resize(np.arange(2, 33), n32)
        sats32 = [SatSignal(prn=int(p), doppler=float(rng.uniform(-4500,
                                                                  4500)),
                            code_delay=float(rng.uniform(0, 2048)),
                            nav_bits=random_bits(4096, seed=100 + i))
                  for i, p in enumerate(prns32)]
        synth32 = JaxSynth(cfg32, sats32, noise_std=0.7, seed=2)
        blk32 = synth32.chunk_planar(0, t_small)
        force_f32(blk32)
        codes32 = jnp.asarray(np.stack([tab[s.prn] for s in sats32]))
        ffts32 = jnp.asarray(to_f32_pairs(
            np.stack([ftab[s.prn] for s in sats32])))
        def fresh32():
            st = init_channel_states(cfg32, n32)
            for i, s in enumerate(sats32):
                st = reset_channel(st, i, s.prn, s.doppler,
                                   int(s.code_delay) % 2048, cfg32)
            return st

        def run32(blocks):
            st = fresh32()
            t0 = time.perf_counter()
            st, o = track_chunk_batched(cfg32, st, blocks,
                                        jnp.float32(1), codes32, ffts32)
            force_f32(o.code_phase)
            return time.perf_counter() - t0, st

        # a 512-block call is ~95% fixed tunnel latency at 32 channels
        # (~130 ms latency vs ~8 ms compute), so report the same
        # two-size amortized rate as the headline metric
        run32(blk32)                                  # compile
        w32s = min(run32(blk32)[0] for _ in range(2))
        t32l = 4 * t_small
        blk32l = synth32.chunk_planar(0, t32l)
        force_f32(blk32l)
        run32(blk32l)                                 # compile at this shape
        w32l, st32b = run32(blk32l)
        w32l = min(w32l, run32(blk32l)[0])
        blk32l.delete()
        s32 = {k: np.asarray(v)
               for k, v in summarize_states(cfg32, st32b).items()}
        d32 = w32l - w32s
        if d32 >= 0.005:
            stress["track_32ch_rtf"] = round(
                (t32l - t_small) * cfg.block_sec / d32, 1)
        else:
            # tunnel noise swallowed the size delta: report the
            # latency-included large-call rate instead of a fiction
            stress["track_32ch_rtf"] = round(
                t32l * cfg.block_sec / w32l, 1)
        stress["track_32ch_rtf_single_call"] = round(sig_small / w32s, 1)
        stress["track_32ch_locked"] = int((s32["locked"] > 0.5).sum())
    except _Skip:
        pass
    except Exception as e:
        stress["track_32ch_rtf"] = _fail(e)
    try:
        if not want("streams"):
            raise _Skip
        # multi-stream serving: S independent receivers in one program
        from gps_sdr_tpu.ops.tracking import track_streams
        n_streams = int(os.environ.get("BENCH_STREAMS", "8"))
        per = []
        for s_i in range(n_streams):
            prns_s = rng.choice(np.arange(2, 33), N_CHANNELS,
                                replace=False)
            sats_s = [SatSignal(prn=int(p),
                                doppler=float(rng.uniform(-4500, 4500)),
                                code_delay=float(rng.uniform(0, 2048)),
                                nav_bits=random_bits(4096,
                                                     seed=500 + s_i))
                      for p in prns_s]
            sy = JaxSynth(cfg, sats_s, noise_std=0.7, seed=20 + s_i)
            b = sy.chunk_planar(0, t_small)
            force_f32(b)
            st = init_channel_states(cfg, N_CHANNELS)
            for i, s in enumerate(sats_s):
                st = reset_channel(st, i, s.prn, s.doppler,
                                   int(s.code_delay) % 2048, cfg)
            per.append((st, b,
                        jnp.asarray(np.stack([tab[s.prn]
                                              for s in sats_s])),
                        jnp.asarray(to_f32_pairs(
                            np.stack([ftab[s.prn] for s in sats_s])))))
        bl = jnp.stack([p[1] for p in per])
        cd = jnp.stack([p[2] for p in per])
        ff = jnp.stack([p[3] for p in per])
        # free the per-stream source chunks: the stacked copy `bl` is
        # another n_streams x 270 MB of HBM
        for p in per:
            p[1].delete()
        per = [(p[0], None, p[2], p[3]) for p in per]
        t_s4 = t_small // 4
        bl_s = bl[:, :t_s4]

        def run_streams(blocks):
            sts = jax.tree.map(lambda *x: jnp.stack(x),
                               *[p[0] for p in per])
            t0 = time.perf_counter()
            stm, o = track_streams(cfg, sts, blocks, jnp.float32(1),
                                   cd, ff)
            force_f32(o.code_phase)
            return time.perf_counter() - t0, o

        # two-size amortized aggregate rate (fixed tunnel latency is
        # ~65% of a single full call at this size)
        run_streams(bl_s)                              # compile small
        ws = min(run_streams(bl_s)[0] for _ in range(2))
        run_streams(bl)                                # compile large
        wm, om = run_streams(bl)
        wm = min(wm, run_streams(bl)[0])
        dsm = wm - ws
        skey = f"streams_{n_streams}x12"
        stress[skey + "_aggregate_rtf"] = round(
            n_streams * (t_small - t_s4) * cfg.block_sec / dsm, 1) \
            if dsm >= 0.005 else round(n_streams * sig_small / wm, 1)
        stress[skey + "_single_call_rtf"] = round(
            n_streams * sig_small / wm, 1)
        stress[skey + "_locked"] = int(np.asarray(jnp.sum(
            om.locked[:, -1].astype(jnp.float32))))
        bl.delete()
    except _Skip:
        pass
    except Exception as e:
        stress["streams_aggregate_rtf"] = _fail(e)
    try:
        if not want("ncyc8"):
            raise _Skip
        # 8 ms position-fix epoch (the reference's N_CYC=8 "powerful
        # computers" mode, gpsglob.py:122-124): 12 channels, two-size
        # amortized rate like the headline
        cfg8 = cfg.replace(n_cyc=8, corr_avg=4,
                           blocks_per_step=min(BLOCKS_PER_STEP, 8))
        synth8 = JaxSynth(cfg8, sats, noise_std=0.7, seed=4)
        t8s, t8l = 512, 2048
        blk8 = synth8.chunk_planar(0, t8l)
        force_f32(blk8)
        codes8, ffts8 = codes, ffts    # code tables are n_cyc-agnostic

        def run8(blocks):
            st = init_channel_states(cfg8, N_CHANNELS)
            for i, s in enumerate(sats):
                st = reset_channel(st, i, s.prn, s.doppler,
                                   int(s.code_delay) % 2048, cfg8)
            t0 = time.perf_counter()
            st, o = track_chunk_batched(cfg8, st, blocks,
                                        jnp.float32(1), codes8, ffts8)
            force_f32(o.code_phase)
            return time.perf_counter() - t0, st

        try:
            run8(blk8[:t8s])
            w8s = min(run8(blk8[:t8s])[0] for _ in range(2))
            run8(blk8)
            w8l, st8 = run8(blk8)
            w8l = min(w8l, run8(blk8)[0])
        finally:
            blk8.delete()
        s8 = {k2: np.asarray(v)
              for k2, v in summarize_states(cfg8, st8).items()}
        d8 = w8l - w8s
        stress["track_ncyc8_rtf"] = round(
            (t8l - t8s) * cfg8.block_sec / d8, 1) if d8 >= 0.005 \
            else round(t8l * cfg8.block_sec / w8l, 1)
        stress["track_ncyc8_locked"] = int((s8["locked"] > 0.5).sum())
    except _Skip:
        pass
    except Exception as e:
        stress["track_ncyc8_rtf"] = _fail(e)
    try:
        if not want("fullloop"):
            raise _Skip
        # --- full receiver system: device-resident IQ -> tracking ->
        #     compact batched download -> host nav decode ->
        #     pseudoranges -> Gauss-Newton fixes.  This is the system a
        #     user actually runs (the reference's gpsrecv.py:445-548 +
        #     gpseval.py as one real-time pipeline, baseline 1.0x); the
        #     headline above is the tracking kernel alone.  The capture
        #     is pre-synthesized into an HBM buffer so the measurement
        #     is the receiver, not the simulator (in production the IQ
        #     arrives by DMA).  Warm-up (acquisition, compiles, first
        #     download window) is excluded by discarding the first
        #     download window of chunks.
        import functools

        from gps_sdr_tpu.models.scenario import make_scenario
        from gps_sdr_tpu.models.scenario_jax import DeviceScenarioSynth
        from gps_sdr_tpu.runtime.evaluator import Evaluator
        from gps_sdr_tpu.runtime.receiver import Receiver

        fl_sec = float(os.environ.get("BENCH_FULL_SEC", "96"))
        # throughput mode: 16-chunk download windows (2x the product
        # default, which favors latency) — the tunnel's fixed ~30-60 ms
        # per-transfer cost is the full-loop floor, so fewer, larger
        # windows buy RTF directly
        t_fl = cfg.no_sec
        n_chunks_fl = int(round(fl_sec / (t_fl * cfg.block_sec)))
        # at least two windows, or the warm-window timing degenerates
        w_fl = min(16, max(1, n_chunks_fl // 2))
        warm_fl = min(w_fl, n_chunks_fl - 1)
        scn = make_scenario(cfg, n_sats=10, seed=3,
                            duration_sec=fl_sec + 12.0)
        devsyn = DeviceScenarioSynth(scn, noise_std=0.5)
        parts = [devsyn.chunk_planar(ci * t_fl, t_fl)
                 for ci in range(n_chunks_fl)]
        buf_fl = jnp.concatenate(parts)
        force_f32(buf_fl[:1])
        for p in parts:
            p.delete()

        @functools.partial(jax.jit, static_argnums=2)
        def _slice_fl(b, first, n):
            return jax.lax.dynamic_slice_in_dim(b, first, n)

        def provider_fl(first, n):
            return _slice_fl(buf_fl, jnp.int32(first), n)

        # throughput mode: consume window k on the host while the
        # device computes window k+1 (identical outputs, +1 window of
        # latency — tests/test_device_transport.py)
        cfg_fl = cfg.replace(download_windows_in_flight=4,
                             chunks_per_download=w_fl,
                             defer_subframe_poll=True,
                             epoch_per_window=True)
        sig_fl = (n_chunks_fl - warm_fl) * t_fl * cfg.block_sec
        fl_rtfs = []
        for _trial in range(3):
            rec_fl = Receiver(cfg_fl)
            ev_fl = Evaluator(cfg_fl)
            t0 = None
            # one epoch per download window; the first (warm) window is
            # excluded from timing
            for epoch in rec_fl.run_device(provider_fl, n_chunks_fl):
                ev_fl.process(epoch)
                if t0 is None:
                    t0 = time.perf_counter()
            fl_rtfs.append(sig_fl / (time.perf_counter() - t0))
        fl_rtfs.sort()
        stress["full_loop_rtf"] = round(float(np.median(fl_rtfs)), 1)
        stress["full_loop_rtf_spread"] = {
            "min": round(fl_rtfs[0], 1), "max": round(fl_rtfs[-1], 1),
            "n": len(fl_rtfs)}
        stress["full_loop_fixes"] = len(ev_fl.positions)
        stress["full_loop_err_m"] = (
            round(float(np.linalg.norm(ev_fl.stat[0] - scn.rec_ecef)), 2)
            if ev_fl.stat is not None else "no fixes")
        buf_fl.delete()
    except _Skip:
        pass
    except Exception as e:
        stress["full_loop_rtf"] = _fail(e)
    try:
        # --- serving with fixes: S full receivers (tracking + nav
        #     decode + pseudoranges + PVT) off one chip via StreamServer
        #     (runtime/serving.py).  Streams share one capture (serving
        #     replicas); each keeps its own slot table, decoders and
        #     evaluator.  Aggregate RTF counts all streams.
        if not want("serving"):
            raise _Skip
        import functools

        from gps_sdr_tpu.models.scenario import make_scenario
        from gps_sdr_tpu.models.scenario_jax import DeviceScenarioSynth
        from gps_sdr_tpu.runtime.evaluator import Evaluator
        from gps_sdr_tpu.runtime.serving import StreamServer

        sv_sec = float(os.environ.get("BENCH_SERVE_SEC", "64"))
        n_sv = int(os.environ.get("BENCH_SERVE_STREAMS", "8"))
        scale_s = [int(x) for x in os.environ.get(
            "BENCH_SERVE_SCALE", "1,2,4,8,16,32,48,64").split(",") if x]
        t_sv = cfg.no_sec
        n_chunks_sv = int(round(sv_sec / (t_sv * cfg.block_sec)))
        # at least two windows, or the warm-window timing degenerates
        w_sv = int(os.environ.get(
            "BENCH_SERVE_W", min(16, max(1, n_chunks_sv // 2))))
        scn_sv = make_scenario(cfg, n_sats=10, seed=5,
                               duration_sec=sv_sec + 12.0)
        dsv = DeviceScenarioSynth(scn_sv, noise_std=0.5)
        parts = [dsv.chunk_planar(ci * t_sv, t_sv)
                 for ci in range(n_chunks_sv)]
        buf_sv = jnp.concatenate(parts)
        force_f32(buf_sv[:1])
        for p in parts:
            p.delete()

        @functools.partial(jax.jit, static_argnums=2)
        def _slice_sv(b, first, n):
            return jax.lax.dynamic_slice_in_dim(b, first, n)

        def provider_sv(first, n):
            return _slice_sv(buf_sv, jnp.int32(first), n)

        cfg_sv = cfg.replace(download_windows_in_flight=4,
                             chunks_per_download=w_sv,
                             defer_subframe_poll=True,
                             epoch_per_window=True)

        from gps_sdr_tpu.runtime.evaluator import process_many

        def serve_once(s_count, chunks):
            srv = StreamServer(cfg_sv, s_count)
            evs = [Evaluator(cfg_sv) for _ in range(s_count)]
            t0 = None
            n_ep = 0
            t_eval = 0.0
            # one epoch per window per stream, evaluated cross-stream
            # batched (process_many: one orbit pass per window); the
            # first (warm) window of all streams is excluded from
            # timing
            pend = []
            perf0 = {}
            for s, epoch in srv.run(provider_sv, chunks):
                pend.append((evs[s], epoch))
                if len(pend) == s_count:
                    te = time.perf_counter()
                    process_many(pend)
                    t_eval += time.perf_counter() - te
                    pend = []
                n_ep += 1
                if n_ep == s_count and t0 is None:
                    t0 = time.perf_counter()
                    perf0 = dict(srv.perf)      # exclude warmup stages
                    t_eval = 0.0
            process_many(pend)
            wall = time.perf_counter() - t0
            warm_c = min(w_sv, chunks - 1)
            sig = (chunks - warm_c) * t_sv * cfg.block_sec
            perf = {k: v - perf0.get(k, 0.0) for k, v in
                    srv.perf.items()}
            perf["evaluate"] = t_eval
            # device-memory footprint estimate (the tunnel exposes no
            # memory_stats): stacked channel states + the in-flight
            # download windows' IQ retention + the shared capture
            state_b = sum(x.nbytes for x in
                          jax.tree.leaves(srv._stacked))
            win_iq_b = (cfg_sv.download_windows_in_flight * w_sv
                        * t_sv * 2 * cfg.ngps * 4)
            perf["dev_state_mb"] = round(state_b / 1e6, 1)
            perf["dev_window_iq_mb"] = round(win_iq_b / 1e6, 1)
            return wall, sig, evs, perf

        wall_sv, sig_sv, evs, perf_sv = serve_once(n_sv, n_chunks_sv)
        stress["serving_stage_sec"] = {
            k: round(v, 3) for k, v in perf_sv.items()
            if not k.startswith("dev_")}
        fixes_sv = [len(e.positions) for e in evs]
        errs = [float(np.linalg.norm(e.stat[0] - scn_sv.rec_ecef))
                for e in evs if e.stat is not None]
        skey = f"serving_{n_sv}x12"
        stress[skey + "_aggregate_rtf"] = round(
            n_sv * sig_sv / wall_sv, 1)
        stress[skey + "_fixes"] = int(sum(fixes_sv))
        stress[skey + "_streams_with_fixes"] = int(
            sum(f > 0 for f in fixes_sv))
        stress[skey + "_max_err_m"] = (round(max(errs), 2) if errs
                                       else "no fixes")

        # aggregate-RTF / fixes-per-second curve vs stream count: where
        # does the single host thread cap the chip?  (VERDICT r2 #5)
        def _dev_mem_mb():
            # device-memory headroom per S (VERDICT r4 #2); not every
            # backend/tunnel exposes memory_stats
            try:
                ms = jax.local_devices()[0].memory_stats()
                return round(ms.get("bytes_in_use", 0) / 1e6, 1)
            except Exception:
                return None

        def _curve_entry(s_count, wall, sig, evs_c, pf):
            host = sum(pf.get(k, 0.0) for k in
                       ("unpack", "consume", "evaluate"))
            stages = {k: round(v, 3) for k, v in pf.items()
                      if not k.startswith("dev_")}
            return {
                "aggregate_rtf": round(s_count * sig / wall, 1),
                "fixes_per_sec": round(
                    sum(len(e.positions) for e in evs_c) / wall, 1),
                "streams_with_fixes": int(sum(
                    1 for e in evs_c if e.positions)),
                "wall_s": round(wall, 2),
                "host_stage_s": round(host, 2),
                "host_share_pct": round(100 * host / wall, 1),
                "stages_s": stages,
                "dev_state_mb": pf.get("dev_state_mb"),
                "dev_window_iq_mb": pf.get("dev_window_iq_mb"),
                "dev_mem_mb": _dev_mem_mb(),
            }

        if want("servecurve"):
            curve = {str(n_sv): _curve_entry(n_sv, wall_sv, sig_sv,
                                             evs, perf_sv)}
            for s_count in scale_s:
                if s_count == n_sv:
                    continue          # reuse the flagship measurement
                try:
                    wall_c, sig_c, evs_c, pf_c = serve_once(s_count,
                                                            n_chunks_sv)
                    curve[str(s_count)] = _curve_entry(
                        s_count, wall_c, sig_c, evs_c, pf_c)
                except Exception as e:
                    curve[str(s_count)] = _fail(e)
            stress["serving_scale_curve"] = curve
        buf_sv.delete()
    except _Skip:
        pass
    except Exception as e:
        stress["serving_fix_rtf"] = _fail(e)
    try:
        if not want("msps16"):
            raise _Skip
        cfg16 = ReceiverConfig(code_samples=16384, n_cyc=8, corr_avg=4,
                               sweep_corr_avg=2)
        sats16 = [SatSignal(prn=int(p),
                            doppler=float(rng.uniform(-4500, 4500)),
                            code_delay=float(rng.uniform(0, 16384)))
                  for p in (4, 9, 27)]
        s16 = JaxSynth(cfg16, sats16, noise_std=0.3, seed=3)
        b16 = s16.chunk_planar(0, 1)
        force_f32(b16)
        ftab16 = cacode.ca_fft_table(cfg16)
        ffts16 = jnp.asarray(to_f32_pairs(
            ftab16[np.asarray(cfg16.prns)]))
        d16 = jnp.asarray(cfg16.doppler_bins, dtype=np.float32)
        r16 = acquire(cfg16, b16[0], d16, ffts16)
        force_f32(r16.norm_max)
        t0 = time.perf_counter()
        r16 = acquire(cfg16, b16[0], d16, ffts16)
        force_f32(r16.norm_max)
        stress["acq_16msps_full_grid_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        stress["acq_16msps_found"] = int(np.asarray(r16.found).sum())

        # 16 MS/s K-fused tracking (the multipath-countermeasure mode,
        # tests/test_multipath.py: half-chip ray bias 40-58 m at
        # 2.048 MS/s -> 5-8 m here); Pallas path measured 1.7x the XLA
        # path at this shape (116 vs 68x wall)
        cfg16t = cfg16.replace(max_sat=3,
                               blocks_per_step=16,
                               use_pallas_kernels=cfg.use_pallas_kernels,
                               use_pallas_cheap=cfg.use_pallas_cheap)

        def st16():
            st = init_channel_states(cfg16t, len(sats16))
            for i, s in enumerate(sats16):
                st = reset_channel(st, i, s.prn, s.doppler,
                                   int(s.code_delay) % 16384, cfg16t)
            return st
        t16 = 512
        blk16 = s16.chunk_planar(0, t16)
        force_f32(blk16)
        tab16 = cacode.ca_table(cfg16t)
        codes16 = jnp.asarray(np.stack([tab16[s.prn] for s in sats16]))
        f16s = jnp.asarray(to_f32_pairs(
            np.stack([ftab16[s.prn] for s in sats16])))

        def run16(st):
            st, outs = track_chunk_batched(
                cfg16t, st, blk16, jnp.float32(1), codes16, f16s)
            force_f32(outs.code_phase)
            return outs
        run16(st16())                             # compile
        w16 = 1e9
        for _ in range(3):                        # state build untimed:
            st = st16()                           # eager resets pay the
            force_f32(st.freq)                    # tunnel per dispatch
            t0 = time.perf_counter()
            o16 = run16(st)
            w16 = min(w16, time.perf_counter() - t0)
        stress["track_16msps_rtf"] = round(
            t16 * cfg16t.block_sec / w16, 1)
        stress["track_16msps_locked"] = int(
            np.asarray(o16.locked)[-1].sum())
    except _Skip:
        pass
    except Exception as e:
        stress["acq_16msps_full_grid_ms"] = _fail(e)
    try:
        if not want("frontend"):
            raise _Skip
        # digital front-end throughput: decimate 1 s of an 8.192 MS/s
        # capture (strided conv on the MXU, ops/frontend.py)
        from gps_sdr_tpu.ops.frontend import _fir_decimate, \
            decimation_taps
        dec = jax.jit(_fir_decimate, static_argnums=(2,))
        taps = jnp.asarray(decimation_taps(4))
        n_in = 4 * cfg.ngps * 32                    # 1.024 s at 4x
        xhi = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (2, n_in)).astype(np.float32))
        force_f32(dec(xhi, taps, 4))                # compile
        t0 = time.perf_counter()
        for _ in range(4):
            force_f32(dec(xhi, taps, 4))
        w = (time.perf_counter() - t0) / 4
        stress["frontend_decimate_msps_in"] = round(n_in / w / 1e6, 1)
    except _Skip:
        pass
    except Exception as e:
        stress["frontend_decimate_msps_in"] = _fail(e)

    summary = {k: np.asarray(v)
               for k, v in summarize_states(cfg, st2).items()}
    locked = int((summary["locked"] > 0.5).sum())
    freq_err = float(np.max(np.abs(
        summary["freq"] - np.array([s.doppler for s in sats]))))
    cp_found = float(np.asarray(
        (jnp.asarray(outs2.code_phase) >= 0).astype(jnp.float32).mean()))

    result = {
        "metric": "realtime_factor_12ch_track",
        "value": round(rtf_slope, 2),
        "unit": "x_realtime_2.048MSps",
        "vs_baseline": round(rtf_slope, 2),
        "extra": {
            "rtf_two_point_amortized": round(rtf_amortized, 2),
            "rtf_trials": rtf_trials,
            "rtf_device_time": (round(rtf_device, 1)
                                if rtf_device else None),
            "device_trace": dev_info,
            "rtf_single_call_incl_latency": round(rtf_raw, 2),
            "acq_full_grid_wall_ms": round(acq_wall_ms, 1),
            "acq_prns_found": n_found,
            "iq_msamples_per_sec": round(2.048 * rtf_slope, 1),
            "synth_rtf_device": round(sig_small / max(synth_wall, 1e-9), 1),
            "channels_locked": locked,
            "max_freq_err_hz": round(freq_err, 2),
            "code_phase_found_frac": round(cp_found, 4),
            "signal_sec_large_run": round(sig_large, 1),
            "host_probe_ms": {"start": round(probe_start_ms, 1),
                              "end": round(host_probe_ms(), 1)},
            "backend": jax.default_backend(),
            "pallas_fallback": pallas_fallback,
            **stress,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
