"""Benchmark: acquisition + 12-channel tracking real-time factor per chip.

The reference's performance envelope is "up to 12 satellites in real
time" at 2.048 MS/s on a multicore CPU (README.md:23-24) => baseline
real-time factor 1.0.  This bench measures the same workload on one
accelerator chip:

  * cold-start acquisition: full 31-PRN x 51-Doppler x 2048-code-phase
    grid on one 32 ms block (one batched MXU program, ops/acquisition.py)
  * streaming tracking: 12 channels through the jitted scan
    (ops/tracking.py), with the synthetic front end fused into the same
    device program so the IQ stream never crosses the host boundary —
    exactly how a production deployment feeds the receiver from a
    device-resident capture/DMA buffer.

The deployment tunnel to the chip has seconds of fixed per-call
latency, so the tracking figure is measured at two stream lengths and
the fixed overhead is removed by differencing (standard amortized
throughput).  Both raw and amortized numbers are reported.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline is the speedup over the reference's real-time factor 1.0.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gps_sdr_tpu.config import ReceiverConfig  # noqa: E402
from gps_sdr_tpu.models.simulator import SatSignal, random_bits  # noqa: E402
from gps_sdr_tpu.models import sim_jax  # noqa: E402
from gps_sdr_tpu.models.sim_jax import JaxSynth  # noqa: E402
from gps_sdr_tpu.ops import cacode  # noqa: E402
from gps_sdr_tpu.ops.acquisition import acquire  # noqa: E402
from gps_sdr_tpu.ops import tracking  # noqa: E402
from gps_sdr_tpu.ops.tracking import (init_channel_states,  # noqa: E402
                                      reset_channel, summarize_states,
                                      to_f32_pairs)

N_CHANNELS = 12


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def synth_and_track(cfg, states, codes, code_ffts, sat_consts, origins,
                    stream_no0):
    """Fused device program: generate one block of 12-sat IQ and track it,
    scanned over T blocks.  Only per-block summaries leave the device.

    origins: [T, 5, S] f32 per-block synth parameters + [T] seeds;
    sat_consts: (codes_tab[S, cs], nav_bits[S, MAX_BITS], amp[S]).
    """
    s_codes, s_bits, s_amp = sat_consts
    code_ffts = tracking.as_complex(code_ffts)
    pos0, pos_rate, ph0, ph_rate, bit_base, seeds = origins
    step = jax.vmap(functools.partial(tracking.channel_step, cfg),
                    in_axes=(0, None, None, 0, 0), out_axes=0)
    t = pos0.shape[0]
    stream_nos = stream_no0.astype(jnp.int32) + jnp.arange(
        t, dtype=jnp.int32)

    def body(carry, x):
        p0, pr, f0, fr, bb, seed, sno = x
        block = sim_jax._synth_block(cfg, s_codes, s_bits, s_amp, p0, pr,
                                     f0, fr, bb, jnp.float32(0.7), seed)
        carry, out = step(carry, block, sno, codes, code_ffts)
        # keep the edge pipeline alive but ship only a checksum
        edge_sum = jnp.sum(out.edge_local * out.edge_valid, axis=-1) \
            + jnp.sum(out.edge_ms * out.edge_valid, axis=-1)
        return carry, (out.code_phase, out.norm_max, out.freq,
                       out.locked.astype(jnp.float32),
                       edge_sum.astype(jnp.float32))

    states, outs = jax.lax.scan(
        body, states, (pos0, pos_rate, ph0, ph_rate, bit_base, seeds,
                       stream_nos))
    return states, outs


def run_tracking(cfg, synth, sats, n_blocks, stream0=1):
    """One fused synth+track call over n_blocks; returns wall seconds."""
    ffts_tab = cacode.ca_fft_table(cfg)
    states = init_channel_states(cfg, N_CHANNELS)
    codes = np.zeros((N_CHANNELS, cfg.code_samples), np.float32)
    ffts = np.zeros((N_CHANNELS, cfg.code_samples), np.complex64)
    for i, s in enumerate(sats):
        states = reset_channel(states, i, s.prn, s.doppler,
                               int(s.code_delay) % cfg.code_samples, cfg)
        codes[i] = cacode.ca_table(cfg)[s.prn]
        ffts[i] = ffts_tab[s.prn]
    codes = jnp.asarray(codes)
    ffts = jnp.asarray(to_f32_pairs(ffts))

    idx = np.arange(stream0 - 1, stream0 - 1 + n_blocks)
    o = synth._origins(idx)
    seeds = ((synth.seed * 9973 + idx) % 8_388_608).astype(np.float32)
    origins = tuple(jnp.asarray(x) for x in (*o, seeds))
    sat_consts = (synth._codes, synth._bits, synth._amp)

    t0 = time.perf_counter()
    states, outs = synth_and_track(cfg, states, codes, ffts, sat_consts,
                                   origins, jnp.float32(stream0))
    cp = np.asarray(outs[0])          # forces completion + download
    wall = time.perf_counter() - t0
    return wall, states, cp, np.asarray(outs[2])


def main():
    cfg = ReceiverConfig(max_sat=N_CHANNELS)
    rng = np.random.default_rng(0)
    prns = rng.choice(np.arange(2, 33), N_CHANNELS, replace=False)
    sats = [SatSignal(prn=int(p),
                      doppler=float(rng.uniform(-4500, 4500)),
                      code_delay=float(rng.uniform(0, 2048)),
                      amplitude=float(rng.uniform(0.8, 1.2)),
                      nav_bits=random_bits(2048, seed=i))
            for i, p in enumerate(prns)]
    synth = JaxSynth(cfg, sats, noise_std=0.7, seed=1)

    # --- acquisition: one full-grid call (compile, then time) ---
    blk = jax.block_until_ready(synth.chunk(0, 1))[0]
    dopplers = jnp.asarray(cfg.doppler_bins, dtype=np.float32)
    all_ffts = jnp.asarray(to_f32_pairs(
        cacode.ca_fft_table(cfg)[np.asarray(cfg.prns)]))
    res = jax.block_until_ready(acquire(cfg, blk, dopplers, all_ffts))
    t0 = time.perf_counter()
    for _ in range(3):
        res = jax.block_until_ready(acquire(cfg, blk, dopplers, all_ffts))
    acq_wall_ms = (time.perf_counter() - t0) / 3 * 1e3
    n_found = int(np.asarray(res.found).sum())

    # --- tracking at two sizes; difference removes fixed call latency ---
    t_small, t_large = 512, 4096          # blocks (16.4 s / 131 s signal)
    run_tracking(cfg, synth, sats, 64)    # compile warmup (small T)...
    w_small, st1, cp1, _ = run_tracking(cfg, synth, sats, t_small)
    w_small2, _, _, _ = run_tracking(cfg, synth, sats, t_small)
    w_small = min(w_small, w_small2)
    w_large, st2, cp2, freq2 = run_tracking(cfg, synth, sats, t_large)

    sig_small = t_small * cfg.block_sec
    sig_large = t_large * cfg.block_sec
    rtf_raw = sig_large / w_large
    rtf_amortized = (sig_large - sig_small) / max(w_large - w_small, 1e-9)

    summary = {k: np.asarray(v)
               for k, v in summarize_states(cfg, st2).items()}
    locked = int((summary["locked"] > 0.5).sum())
    freq_err = float(np.max(np.abs(
        summary["freq"] - np.array([s.doppler for s in sats]))))
    cp_found = float((cp2 >= 0).mean())

    result = {
        "metric": "realtime_factor_12ch_track",
        "value": round(rtf_amortized, 2),
        "unit": "x_realtime_2.048MSps",
        "vs_baseline": round(rtf_amortized, 2),
        "extra": {
            "rtf_single_call_incl_latency": round(rtf_raw, 2),
            "acq_full_grid_wall_ms": round(acq_wall_ms, 1),
            "acq_prns_found": n_found,
            "iq_msamples_per_sec": round(2.048 * rtf_amortized, 1),
            "channels_locked": locked,
            "max_freq_err_hz": round(freq_err, 2),
            "code_phase_found_frac": round(cp_found, 4),
            "signal_sec_large_run": round(sig_large, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
