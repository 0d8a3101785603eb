"""Pallas fused mix+wipeoff kernel vs the XLA heavy stage.

Runs in Pallas interpret mode on the CPU backend (small shapes); the
real-chip validation is bench.py with cfg.use_pallas_kernels=True."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gps_sdr_tpu.config import ReceiverConfig
from gps_sdr_tpu.models.simulator import SatSignal, random_bits, synth_stream
from gps_sdr_tpu.ops import cacode
from gps_sdr_tpu.ops.pallas_kernels import heavy_stage_pallas
from gps_sdr_tpu.ops.tracking import (heavy_stage, init_channel_states,
                                      reset_channel, track_chunk_batched)

CFG = ReceiverConfig(code_samples=256, n_cyc=8, corr_avg=4,
                     sweep_corr_avg=2, blocks_per_step=4)
SATS = [SatSignal(prn=5, doppler=987.0, code_delay=77.25,
                  nav_bits=random_bits(64, seed=5)),
        SatSignal(prn=12, doppler=-2210.0, code_delay=200.5,
                  nav_bits=random_bits(64, seed=12))]


def _setup(k=4):
    blocks = synth_stream(CFG, SATS, k, noise_std=0.2, seed=9)
    states = init_channel_states(CFG, 2)
    codes = np.zeros((2, CFG.code_samples), np.float32)
    ffts = np.zeros((2, CFG.code_samples), np.complex64)
    for i, s in enumerate(SATS):
        states = reset_channel(states, i, s.prn, s.doppler,
                               int(s.code_delay), CFG)
        codes[i] = cacode.ca_table(CFG)[s.prn]
        ffts[i] = cacode.ca_fft_table(CFG)[s.prn]
    return states, jnp.asarray(blocks), jnp.asarray(codes), \
        jnp.asarray(ffts)


@pytest.mark.parametrize("mxu", [True, False])
def test_heavy_stage_pallas_matches_xla(mxu):
    states, blocks, codes, ffts = _setup()
    cfg = CFG.replace(use_mxu_wipeoff=mxu)
    ref = heavy_stage(cfg, 4, states, blocks, codes, ffts)
    got = heavy_stage_pallas(cfg, 4, states, blocks, codes, ffts)
    np.testing.assert_array_equal(np.asarray(ref.delay_k),
                                  np.asarray(got.delay_k))
    np.testing.assert_allclose(np.asarray(ref.code_phase_k),
                               np.asarray(got.code_phase_k), atol=5e-3)
    np.testing.assert_allclose(np.asarray(ref.norm_max_k),
                               np.asarray(got.norm_max_k), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ref.head_k),
                               np.asarray(got.head_k), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ref.seg_sums_k),
                               np.asarray(got.seg_sums_k), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ref.phase_end),
                               np.asarray(got.phase_end), atol=1e-3)


def test_track_chunk_batched_with_pallas():
    states, _, codes, ffts = _setup()
    blocks = jnp.asarray(synth_stream(CFG, SATS, 16, noise_std=0.2,
                                      seed=9))
    ref_st, ref = track_chunk_batched(CFG, _setup()[0], blocks,
                                      jnp.int32(1), codes, ffts)
    cfgp = CFG.replace(use_pallas_kernels=True)
    got_st, got = track_chunk_batched(cfgp, _setup()[0], blocks,
                                      jnp.int32(1), codes, ffts)
    np.testing.assert_allclose(np.asarray(ref.code_phase),
                               np.asarray(got.code_phase), atol=5e-3)
    np.testing.assert_allclose(np.asarray(ref.freq),
                               np.asarray(got.freq), atol=0.5)
    np.testing.assert_array_equal(np.asarray(ref.edge_valid),
                                  np.asarray(got.edge_valid))
