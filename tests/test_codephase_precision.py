"""Sub-sample code-phase measurement precision.

1 sample at 2.048 MS/s is ~146 m of range; meter-class positioning
requires the correlator's triangle+parabola sub-sample peak fit
(reference fitCodePhase, gpslib.py:1268-1290) to resolve ~0.01-0.05
samples.  Measures RMS error of the tracked code phase against the
simulator's exact delay trajectory."""

import numpy as np
import jax.numpy as jnp

from gps_sdr_tpu.config import ReceiverConfig
from gps_sdr_tpu.models.simulator import SatSignal, random_bits, synth_stream
from gps_sdr_tpu.ops import cacode
from gps_sdr_tpu.ops.tracking import (init_channel_states, outs_to_numpy,
                                      reset_channel, track_chunk)
from tests.conftest import cached_synth

CFG = ReceiverConfig()


def _true_code_phase(sat, block_idx):
    """Code phase the correlator should measure at each block's center:
    sample offset (mod cs) of the code start nearest the block center."""
    fs = CFG.sample_rate
    cs = CFG.code_samples
    n_center = block_idx * CFG.ngps + CFG.ngps // 2
    d = sat.code_delay + sat.delay_rate(CFG) * (n_center / fs)
    return (d % cs), d


def test_subsample_code_phase_rms():
    sat = SatSignal(prn=17, doppler=-3456.0, code_delay=1023.37,
                    nav_bits=random_bits(128, seed=17))
    n_blocks = 64
    blocks = cached_synth("cp_precision_v1", lambda: synth_stream(
        CFG, [sat], n_blocks, noise_std=0.5, seed=4))
    states = init_channel_states(CFG, 1)
    states = reset_channel(states, 0, 17, sat.doppler,
                           int(sat.code_delay), CFG)
    _, outs = track_chunk(CFG, states, jnp.asarray(blocks), jnp.int32(1),
                          jnp.asarray(cacode.ca_table(CFG)[17][None]),
                          jnp.asarray(cacode.ca_fft_table(CFG)[17][None]))
    o = outs_to_numpy(outs)
    got = o.code_phase[:, 0]
    idx = np.arange(n_blocks)
    true = np.array([_true_code_phase(sat, b)[0] for b in idx])
    ok = got >= 0
    assert ok.mean() > 0.9
    err = (got[ok] - true[ok] + CFG.code_samples / 2) \
        % CFG.code_samples - CFG.code_samples / 2
    # drop the lock transient
    err = err[5:]
    rms = float(np.sqrt(np.mean(err ** 2)))
    bias = float(np.mean(err))
    # 0.05 samples ~ 7 m of range noise per 32 ms epoch -- consistent
    # with the reference's 1-5 m SD after per-second averaging
    assert rms < 0.08, f"code phase RMS {rms:.4f} samples"
    assert abs(bias) < 0.05, f"code phase bias {bias:.4f} samples"


def test_subsample_resolution_beats_integer():
    """The sub-sample fit must clearly beat +-0.5-sample quantization."""
    sat = SatSignal(prn=17, doppler=-3456.0, code_delay=1023.37,
                    nav_bits=random_bits(128, seed=17))
    blocks = cached_synth("cp_precision_v1", lambda: synth_stream(
        CFG, [sat], 64, noise_std=0.5, seed=4))
    states = init_channel_states(CFG, 1)
    states = reset_channel(states, 0, 17, sat.doppler,
                           int(sat.code_delay), CFG)
    _, outs = track_chunk(CFG, states, jnp.asarray(blocks), jnp.int32(1),
                          jnp.asarray(cacode.ca_table(CFG)[17][None]),
                          jnp.asarray(cacode.ca_fft_table(CFG)[17][None]))
    o = outs_to_numpy(outs)
    got = o.code_phase[5:, 0]
    frac = got[got >= 0] % 1.0
    # fractional parts must be spread, not clustered at 0/0.5
    assert np.std(frac) > 0.05
