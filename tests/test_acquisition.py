"""Batched acquisition tests on synthetic multi-satellite IQ."""

import numpy as np

from gps_sdr_tpu.config import DEFAULT as CFG
from gps_sdr_tpu.ops import cacode
from gps_sdr_tpu.ops.acquisition import acquire_all
from gps_sdr_tpu.models.simulator import SatSignal, synth_stream


def test_acquire_multi_sat():
    truth = [
        SatSignal(prn=5, doppler=1850.0, code_delay=300, amplitude=1.0),
        SatSignal(prn=12, doppler=-3200.0, code_delay=1500, amplitude=0.8),
        SatSignal(prn=29, doppler=400.0, code_delay=2047, amplitude=0.9),
    ]
    blocks = synth_stream(CFG, truth, n_blocks=1, noise_std=1.0, seed=3)
    found = acquire_all(CFG, blocks[0], cacode.ca_fft_table(CFG))
    by_prn = {prn: (corr, freq, delay) for corr, prn, freq, delay in found}

    assert set(by_prn) == {5, 12, 29}
    for s in truth:
        corr, freq, delay = by_prn[s.prn]
        assert corr > CFG.corr_min
        assert abs(freq - s.doppler) <= CFG.step_freq  # grid resolution
        assert min(abs(delay - s.code_delay),
                   CFG.code_samples - abs(delay - s.code_delay)) <= 1


def test_acquire_empty_on_noise():
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(CFG.ngps)
             + 1j * rng.standard_normal(CFG.ngps)).astype(np.complex64)
    found = acquire_all(CFG, noise, cacode.ca_fft_table(CFG))
    assert found == []


def test_acquire_subset_prns():
    truth = [SatSignal(prn=7, doppler=-1000.0, code_delay=77)]
    blocks = synth_stream(CFG, truth, n_blocks=1, noise_std=0.5, seed=1)
    found = acquire_all(CFG, blocks[0], cacode.ca_fft_table(CFG), prns=[7])
    assert len(found) == 1 and found[0][1] == 7
