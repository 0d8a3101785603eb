"""Pallas cheap-stage kernel vs the XLA cheap stage (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gps_sdr_tpu.config import ReceiverConfig
from gps_sdr_tpu.models.simulator import SatSignal, random_bits, synth_stream
from gps_sdr_tpu.ops import cacode
from gps_sdr_tpu.ops.tracking import (init_channel_states, outs_to_numpy,
                                      reset_channel, track_chunk_batched)

CFG = ReceiverConfig(code_samples=256, n_cyc=8, corr_avg=4,
                     sweep_corr_avg=2, blocks_per_step=4,
                     corr_q_window_sec=2)
SATS = [SatSignal(prn=5, doppler=987.0, code_delay=77.25,
                  nav_bits=random_bits(64, seed=5)),
        SatSignal(prn=12, doppler=-2210.0, code_delay=200.5,
                  nav_bits=random_bits(64, seed=12))]


def _setup(n_blocks):
    blocks = synth_stream(CFG, SATS, n_blocks, noise_std=0.2, seed=9)
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


def test_cheap_kernel_matches_xla():
    _, blocks, codes, ffts = _setup(16)
    ref_st, ref = track_chunk_batched(CFG, _setup(16)[0], blocks,
                                      jnp.int32(1), codes, ffts)
    cfgp = CFG.replace(use_pallas_cheap=True)
    got_st, got = track_chunk_batched(cfgp, _setup(16)[0], blocks,
                                      jnp.int32(1), codes, ffts)
    ro, go = outs_to_numpy(ref), outs_to_numpy(got)
    np.testing.assert_allclose(ro.code_phase, go.code_phase, atol=1e-5)
    np.testing.assert_allclose(ro.amplitude, go.amplitude,
                           rtol=1e-3)  # f32 reduction-order
    np.testing.assert_allclose(ro.corr_q, go.corr_q, atol=1e-6)
    np.testing.assert_allclose(ro.corr_l, go.corr_l, atol=1e-6)
    np.testing.assert_array_equal(ro.locked, go.locked)
    np.testing.assert_array_equal(ro.sign0, go.sign0)
    np.testing.assert_array_equal(ro.edge_valid, go.edge_valid)
    np.testing.assert_array_equal(ro.edge_ms[ro.edge_valid],
                                  go.edge_ms[go.edge_valid])
    np.testing.assert_array_equal(ro.edge_local[ro.edge_valid],
                                  go.edge_local[go.edge_valid])
    np.testing.assert_allclose(ro.freq, go.freq, atol=1e-3)
    for name in ("freq", "phase", "std_dev", "prev_signal"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref_st, name)),
            np.asarray(getattr(got_st, name)), atol=1e-3)
    for name in ("delay", "ms_time", "df_cnt", "corr_cnt", "locked",
                 "sign0", "prev_sign", "carry_cnt"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref_st, name)),
            np.asarray(getattr(got_st, name)))
    np.testing.assert_allclose(np.asarray(ref_st.df_buf),
                               np.asarray(got_st.df_buf), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref_st.corr_buf),
                                  np.asarray(got_st.corr_buf))


def test_large_ms_time_exact():
    """ms_time past 2^24 must stay integer-exact through the Pallas path.

    The kernel carries ms_time rebased to zero (an f32 row loses integer
    precision past 2^24 ms ~ 4.7 h of lock) and the int32 base is added
    back on exit — edge timestamps and the carried counter must match
    the XLA path bit-for-bit (regression: ADVICE r1, hours-class serving
    runs silently corrupted 20 ms bit framing)."""
    base = 2 ** 25 + 3                     # odd offset: not f32-exact +1
    _, blocks, codes, ffts = _setup(16)

    def fresh():                           # state is donated per call
        s = _setup(16)[0]
        return s._replace(ms_time=jnp.full_like(s.ms_time, base))

    ref_st, ref = track_chunk_batched(CFG, fresh(), blocks, jnp.int32(1),
                                      codes, ffts)
    cfgp = CFG.replace(use_pallas_cheap=True)
    got_st, got = track_chunk_batched(cfgp, fresh(), blocks, jnp.int32(1),
                                      codes, ffts)
    ro, go = outs_to_numpy(ref), outs_to_numpy(got)
    np.testing.assert_array_equal(ro.edge_valid, go.edge_valid)
    np.testing.assert_array_equal(ro.edge_ms[ro.edge_valid],
                                  go.edge_ms[go.edge_valid])
    assert np.all(np.asarray(go.edge_ms)[np.asarray(go.edge_valid)]
                  > base)                  # offsets survived the rebase
    np.testing.assert_array_equal(np.asarray(ref_st.ms_time),
                                  np.asarray(got_st.ms_time))
    # the increment itself must be odd-exact, not rounded to even
    assert np.all((np.asarray(got_st.ms_time) - base) % 2
                  == np.asarray(ref_st.ms_time - base) % 2)


def test_delay_wrap_zero_mean_no_nan():
    """Code-delay wrap through 0: wipe_delay=0 leaves carry_cnt=0, so the
    next block's slot-0 mean is exactly 0+0j.  The PLL's arctan(Q/I) must
    not let the resulting 0/0 contaminate the masked sums (regression:
    freq latched to NaN after ~16 s on-chip when a channel wrapped)."""
    import functools
    import jax
    from gps_sdr_tpu.ops.tracking import HeavyOut, channel_step_k
    from gps_sdr_tpu.ops.pallas_cheap import cheap_stage_pallas

    cfg, k = CFG, CFG.blocks_per_step
    n_ch, cs, n_cyc = 2, cfg.code_samples, cfg.n_cyc
    states = init_channel_states(cfg, n_ch)
    for i, s in enumerate(SATS):
        states = reset_channel(states, i, s.prn, s.doppler, 0, cfg)
    states = states._replace(
        locked=jnp.ones(n_ch, bool),
        std_dev=jnp.full((n_ch,), 0.05, jnp.float32),
        carry_sum=jnp.zeros(n_ch, jnp.complex64),
        carry_cnt=jnp.zeros(n_ch, jnp.int32),
        prev_stream=jnp.zeros(n_ch, jnp.int32))

    rng = np.random.default_rng(3)
    segs = (cs * 0.05 * (1.0 + 0.1 * rng.standard_normal((n_ch, k, n_cyc)))
            ).astype(np.float32) + 1j * (cs * 0.005 * rng.standard_normal(
                (n_ch, k, n_cyc))).astype(np.float32)
    heavy = HeavyOut(
        delay_k=jnp.zeros((n_ch, k), jnp.int32),
        code_phase_k=jnp.full((n_ch, k), 0.25, jnp.float32),
        norm_max_k=jnp.full((n_ch, k), 12.0, jnp.float32),
        new_delay_k=jnp.zeros((n_ch, k), jnp.int32),
        head_k=jnp.zeros((n_ch, k), jnp.complex64),
        seg_sums_k=jnp.asarray(segs, jnp.complex64),
        phase_end=jnp.zeros((n_ch,), jnp.float32),
        wipe_delay=jnp.zeros((n_ch, k), jnp.int32))

    xla = jax.vmap(functools.partial(channel_step_k, cfg, k),
                   in_axes=(0, 0, None), out_axes=0)
    st_x, out_x = xla(states, heavy, jnp.int32(1))
    st_p, out_p = cheap_stage_pallas(cfg, k, states, heavy, jnp.int32(1))
    for st in (st_x, st_p):
        assert np.isfinite(np.asarray(st.freq)).all()
        assert np.isfinite(np.asarray(st.phase)).all()
        assert np.isfinite(np.asarray(st.std_dev)).all()
    np.testing.assert_allclose(np.asarray(st_x.freq), np.asarray(st_p.freq),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_x.amplitude),
                               np.asarray(out_p.amplitude),
                               rtol=1e-3)  # f32 reduction-order


def test_cheap_kernel_erase_on_gap():
    st, blocks, codes, ffts = _setup(8)
    cfgp = CFG.replace(use_pallas_cheap=True)
    st, _ = track_chunk_batched(cfgp, st, blocks[:4], jnp.int32(1),
                                codes, ffts)
    st, got = track_chunk_batched(cfgp, st, blocks[4:], jnp.int32(20),
                                  codes, ffts)
    go = outs_to_numpy(got)
    assert go.erased[0].all()
    assert not go.erased[1:].any()
