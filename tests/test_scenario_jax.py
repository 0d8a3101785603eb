"""Device-side scenario synthesis vs the float64 numpy oracle."""

import numpy as np
import pytest

from gps_sdr_tpu.config import ReceiverConfig
from gps_sdr_tpu.models.scenario import make_scenario, synth_scenario_blocks
from gps_sdr_tpu.models.scenario_jax import DeviceScenarioSynth

CFG = ReceiverConfig()


@pytest.fixture(scope="module")
def scn():
    return make_scenario(CFG, n_sats=3, duration_sec=12.0, seed=3)


def test_matches_numpy_oracle(scn):
    ref = synth_scenario_blocks(scn, 0, 2, noise_std=0.0)
    dev = DeviceScenarioSynth(scn, noise_std=0.0)
    got = np.asarray(dev.chunk(0, 2))
    err = np.abs(got - ref)
    # f32 interpolation differences only; the oracle itself commits
    # ~1e-3-scale interp error at chip transitions
    assert np.quantile(err, 0.999) < 2e-2
    assert err.mean() < 2e-3


def test_chunk_offset_matches(scn):
    ref = synth_scenario_blocks(scn, 5, 1, noise_std=0.0)
    dev = DeviceScenarioSynth(scn, noise_std=0.0)
    got = np.asarray(dev.chunk(5, 1))
    assert np.abs(got - ref).mean() < 2e-3


def test_chunk_continuity(scn):
    dev = DeviceScenarioSynth(scn, noise_std=0.0)
    whole = np.asarray(dev.chunk(0, 2))
    parts = np.concatenate([np.asarray(dev.chunk(0, 1)),
                            np.asarray(dev.chunk(1, 1))])
    np.testing.assert_allclose(parts, whole, atol=1e-5)
