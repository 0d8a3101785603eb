"""Pallas kernel for the K-block cheap feedback stage.

The cheap stage (ops/tracking.py channel_step_k: means assembly,
rotation PLL, bit-edge scan, quality rings) is sequential across blocks
and across the 33 per-ms means — as XLA ops this is hundreds of tiny
launches per step (~1.4 us each), and after the heavy-stage kernel it
is the largest remaining slice of device time.  In-kernel the same
sequence runs as register/VMEM operations with no launch overhead.

Data layout: every per-channel quantity is a row vector over the lane
axis [rows, C]; integer-valued state rides in f32 (all counters here
stay far below 2^24 within a session hour).  Semantics are a
line-faithful port of _means_from_sums, _edge_scan, _pll and
_corr_quality; equivalence is pinned by tests/test_pallas_cheap.py on
CPU (interpret mode) and by the batched-vs-sequential tracking tests.

State row map (NS = 16):
   0 carry_re  1 carry_im  2 carry_cnt  3 sign0      4 prev_sign
   5 prev_sig  6 ms_time   7 std_dev    8 locked     9 df_cnt
  10 df_idx   11 corr_cnt 12 corr_idx  13 wipe_delay[0] 14 dphi
  15 df_sum
(per-block wipeoff delays ride a separate [K, C] input; row 13 only
seeds the layout)
Output row map (outs[K, 8, C]):
   0 amplitude 1 corr_q 2 corr_l 3 locked 4 sign0
   5 phase_offset (per-block PLL offset, diagnostic) (6-7 spare)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gps_sdr_tpu.config import ReceiverConfig

NS = 16


def _atan(x):
    """arctan for Mosaic (no atan primitive): range-reduce to [0, 1]
    and evaluate a minimax polynomial (max error ~1e-6 rad — far below
    the PLL's 0.1 rad lock threshold and 2.0 rad unwrap trigger)."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    z2 = z * z
    p = jnp.float32(-0.0117212)
    for coef in (0.05265332, -0.11643287, 0.19354346, -0.33262347,
                 0.99997726):
        p = p * z2 + jnp.float32(coef)
    r = z * p
    r = jnp.where(inv, jnp.float32(np.pi / 2) - r, r)
    return jnp.sign(x) * r


def _cheap_kernel(cfg: ReceiverConfig, k: int, sums_ref, found_ref,
                  wipe_ref, state_ref, dfbuf_ref, corrbuf_ref,
                  outs_ref, edges_ref, nstate_ref, ndf_ref, ncorr_ref,
                  qbuf_ref, lbuf_ref):
    cs = cfg.code_samples
    n_cyc = cfg.n_cyc
    sl = n_cyc + 1
    no_sec = cfg.no_sec
    hist = cfg.corr_hist_len
    c = state_ref.shape[-1]
    f32 = jnp.float32

    row_sl = jax.lax.broadcasted_iota(jnp.int32, (sl, 1), 0) \
        .astype(f32)                                   # [sl, 1]
    row_df = jax.lax.broadcasted_iota(jnp.int32, (no_sec, 1), 0) \
        .astype(f32)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (1, hist), 1) \
        .astype(f32)                                   # [1, hist]
    tri_i = jax.lax.broadcasted_iota(jnp.int32, (sl - 1, sl - 1), 0)
    tri_j = jax.lax.broadcasted_iota(jnp.int32, (sl - 1, sl - 1), 1)
    tril = (tri_i >= tri_j).astype(f32)
    # strictly-lower [sl, sl]: exclusive prefix counts for the edge scan
    si = jax.lax.broadcasted_iota(jnp.int32, (sl, sl), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (sl, sl), 1)
    stril = (si > sj).astype(f32)

    def r1(ref, i):                      # one state row as [1, C]
        return ref[i:i + 1, :]

    # ---- load state ----
    carry_re = r1(state_ref, 0)
    carry_im = r1(state_ref, 1)
    carry_cnt = r1(state_ref, 2)
    sign0 = r1(state_ref, 3)
    prev_sign = r1(state_ref, 4)
    prev_sig = r1(state_ref, 5)
    ms_time = r1(state_ref, 6)
    std_dev = r1(state_ref, 7)
    locked = r1(state_ref, 8)
    df_cnt = r1(state_ref, 9)
    df_idx = r1(state_ref, 10)
    # corr ring counters live as [C, 1] columns inside the kernel: the
    # ring itself is LANE-major [C, hist] so every per-block ring op
    # touches a [C_pad, hist] tile instead of a [hist, 128-lane-padded]
    # one (8x fewer vector cycles at 12 channels, and ~8x less scoped
    # vmem — the [hist, C] layout overflowed Mosaic's 16 MB stack at
    # n_cyc=8 where hist=7680)
    cnt_c = jnp.transpose(r1(state_ref, 11))           # [C, 1]
    idx_c = jnp.transpose(r1(state_ref, 12))
    delay = r1(state_ref, 13)
    dphi = r1(state_ref, 14)
    df_sum = r1(state_ref, 15)
    dfbuf = dfbuf_ref[:, :]
    corrbuf = corrbuf_ref[:, :]

    for b in range(k):
        # per-block wipeoff boundary delay (code Doppler drift — see
        # ops/tracking.py predict_wipe_delays)
        delay = wipe_ref[b:b + 1, :]
        # ---- means assembly (_means_from_sums) ----
        head_re = sums_ref[b, 0:1, :]
        head_im = sums_ref[b, sl:sl + 1, :]
        segs_re = sums_ref[b, 1:sl, :]                  # [n_cyc, C]
        segs_im = sums_ref[b, sl + 1:2 * sl, :]
        cnt0 = carry_cnt + delay
        inv0 = 1.0 / jnp.maximum(cnt0, 1.0)
        m0_re = (carry_re + head_re) * inv0
        m0_im = (carry_im + head_im) * inv0
        v0 = (cnt0 > 0).astype(f32)                     # [1, C]
        k_full = f32(n_cyc) - (delay > 0).astype(f32)
        means_re = jnp.concatenate([m0_re, segs_re * f32(1.0 / cs)], 0)
        means_im = jnp.concatenate([m0_im, segs_im * f32(1.0 / cs)], 0)
        starts = jnp.concatenate(
            [-carry_cnt, delay + f32(cs) * row_sl[:n_cyc]], 0)
        valid = jnp.concatenate(
            [v0, (row_sl[:n_cyc] < k_full).astype(f32)], 0)
        new_carry_re = jnp.where(delay > 0, segs_re[n_cyc - 1:n_cyc, :],
                                 0.0)
        new_carry_im = jnp.where(delay > 0, segs_im[n_cyc - 1:n_cyc, :],
                                 0.0)
        new_carry_cnt = jnp.where(delay > 0, f32(cs) - delay, 0.0)
        # compact (roll up when the carry slot is empty)
        shift = lambda x: jnp.concatenate([x[1:], x[:1]], 0)
        means_re = jnp.where(v0 > 0, means_re, shift(means_re))
        means_im = jnp.where(v0 > 0, means_im, shift(means_im))
        starts = jnp.where(v0 > 0, starts, shift(starts))
        n_valid = k_full + v0                           # [1, C]
        mask = (row_sl < n_valid).astype(f32)           # [sl, C]
        carry_re, carry_im, carry_cnt = (new_carry_re, new_carry_im,
                                         new_carry_cnt)

        # ---- rotate by accumulated phase corrections + the virtual
        # intra-step NCO retune (2*pi*df_sum*t ramp; the real NCO is
        # frozen for the step — ops/tracking.py channel_step_k) ----
        t_m = (starts + f32(0.5 * cs)) * f32(1.0 / cfg.sample_rate)
        ang = dphi + f32(2 * np.pi) * df_sum * t_m
        cr, sr = jnp.cos(ang), jnp.sin(ang)
        mr = means_re * cr + means_im * sr
        mi = means_im * cr - means_re * sr
        means_re, means_im = mr, mi

        # ---- correlation-quality ring (_corr_quality), lane-major ----
        cpq_c = jnp.where(found_ref[:, b:b + 1] > 0, 1.0, -1.0)  # [C,1]
        pos_c = jnp.where(cnt_c < hist, cnt_c,
                          jnp.mod(idx_c, f32(hist)))
        corrbuf = jnp.where(col_h == pos_c, cpq_c, corrbuf)
        cnt_c = jnp.minimum(cnt_c + 1.0, f32(hist))
        idx_c = jnp.where(cnt_c < hist, idx_c,
                          jnp.mod(idx_c + 1.0, f32(hist)))
        q_c = jnp.sum(corrbuf, axis=1, keepdims=True) / cnt_c
        age = jnp.where(cnt_c < hist, cnt_c - 1.0 - col_h,
                        jnp.mod(idx_c - 1.0 - col_h, f32(hist)))
        # ages 0..min(cnt, no_sec)-1 form the 1 s window; when full the
        # ages of live entries are exactly 0..hist-1 so the window mask
        # is well defined
        win = jnp.minimum(cnt_c, f32(no_sec))
        lmask = ((age >= 0) & (age < win)).astype(f32)
        l_c = jnp.sum(corrbuf * lmask, axis=1, keepdims=True) \
            / jnp.maximum(jnp.sum(lmask, axis=1, keepdims=True), 1.0)
        qbuf_ref[:, b:b + 1] = q_c
        lbuf_ref[:, b:b + 1] = l_c

        # ---- bit-edge scan, VECTORIZED over the sl slots ----
        # same prefix formulation as ops/tracking.py _edge_scan (see its
        # docstring for the equivalence argument): acceptance can only
        # happen at sign-flip candidates, after any candidate the chain
        # sign equals that slot's msign, so the chain state is a cummax
        # over position-encoded candidate signs (log-doubling shifts —
        # Mosaic has no scan primitive) and the exclusive do-count
        # prefix is a strictly-lower-triangular matmul.
        min_edge_amp = f32(cfg.edge_sigma) * std_dev
        do2 = ((mask > 0) & (locked > 0)).astype(f32)    # [sl, C]
        n_do = jnp.sum(do2, axis=0, keepdims=True)       # [1, C]
        has = n_do > 0
        msign2 = jnp.where(means_re >= 0, 1.0, -1.0)
        psig2 = jnp.concatenate([prev_sig, means_re[:-1]], 0)
        spm2 = jnp.where(psig2 >= 0, 1.0, -1.0)
        gate2 = jnp.abs(means_re - psig2) > min_edge_amp
        chain = sign0 != 0                               # [1, C]
        first_slot = (~chain) & (row_sl == 0)
        cand = ((do2 > 0) & (msign2 != spm2) & (psig2 != 0) & gate2
                & (~first_slot))
        base = jnp.where(chain, prev_sign, msign2[0:1])  # [1, C]
        key = jnp.where(cand, 2.0 * (row_sl + 1.0)
                        + (msign2 > 0).astype(f32), 0.0)
        cum = key
        sh = 1
        while sh < sl:
            cum = jnp.maximum(cum, jnp.concatenate(
                [jnp.zeros((sh, c), f32), cum[:-sh]], 0))
            sh *= 2
        cum_excl = jnp.concatenate([jnp.zeros((1, c), f32),
                                    cum[:-1]], 0)
        psign_pre = jnp.where(cum_excl > 0,
                              jnp.where(jnp.mod(cum_excl, 2.0) == 1.0,
                                        1.0, -1.0), base)
        accept = cand & (psign_pre == spm2)
        edges_ref[b, 0:sl, :] = ms_time + jnp.dot(
            stril, do2, preferred_element_type=f32)
        edges_ref[b, sl:2 * sl, :] = starts
        edges_ref[b, 2 * sl:3 * sl, :] = accept.astype(f32)
        ms_time = ms_time + n_do
        sign0 = jnp.where(chain | ~has, sign0, msign2[0:1])
        last_key = cum[sl - 1:sl]
        psign_end = jnp.where(last_key > 0,
                              jnp.where(jnp.mod(last_key, 2.0) == 1.0,
                                        1.0, -1.0), base)
        prev_sign = jnp.where(has, psign_end, prev_sign)
        prev_sig = jnp.where(has, jnp.sum(
            jnp.where(row_sl == n_do - 1.0, means_re, 0.0),
            axis=0, keepdims=True), prev_sig)

        # ---- amplitude / sigma ----
        mag2 = means_re * means_re + means_im * means_im
        mag = jnp.sqrt(mag2)
        nv = jnp.maximum(n_valid, 1.0)
        amp_mean = jnp.sum(mag * mask, axis=0, keepdims=True) / nv
        var = jnp.sum(mag2 * mask, axis=0, keepdims=True) / nv \
            - amp_mean * amp_mean
        std_dev = jnp.sqrt(jnp.maximum(var, 1e-12))
        amplitude = amp_mean / std_dev

        # ---- PLL (_pll) ----
        # guard exact-zero means (delay-wrap edge case, see _pll):
        # 0/0 NaN would survive the mask multiplies below
        re_nz = means_re != 0.0
        phase = _atan(means_im / jnp.where(re_nz, means_re, 1.0))
        phase = jnp.where(re_nz, phase,
                          jnp.sign(means_im) * f32(np.pi / 2))  # [sl, C]
        deltas = phase[1:] - phase[:-1]                  # [sl-1, C]
        dmask = (row_sl[1:] < n_valid).astype(f32)
        steps = jnp.where(
            (dmask > 0) & (jnp.abs(deltas) > f32(cfg.pll_phase_jump)),
            -jnp.sign(deltas), 0.0)
        # prefix sum over <= 32 rows as a lower-triangular matmul
        # (Mosaic has no cumsum primitive)
        csteps = jnp.dot(tril, steps, preferred_element_type=f32)
        real_phase = phase + jnp.concatenate(
            [jnp.zeros((1, c), f32), csteps], 0) * f32(np.pi)
        phase_dev = jnp.sum(real_phase * mask, axis=0, keepdims=True) / nv
        tailm = ((row_sl >= n_valid - f32(cfg.pll_offset_avg))
                 .astype(f32)) * mask
        phase_offset = jnp.sum(real_phase * tailm, axis=0,
                               keepdims=True) \
            / jnp.maximum(jnp.sum(tailm, axis=0, keepdims=True), 1.0)
        mean_df = jnp.sum(dfbuf, axis=0, keepdims=True) \
            / jnp.maximum(df_cnt, 1.0)
        max_df = f32(cfg.pll_max_df_per_sec / no_sec)
        df_locked = jnp.clip(
            f32(cfg.pll_gain_locked) * phase_dev + mean_df,
            -max_df, max_df)
        df_un = f32(cfg.pll_gain_unlocked) * phase_dev
        df = jnp.where(locked > 0, df_locked, df_un)
        posd = jnp.where(df_cnt < no_sec, df_cnt,
                         jnp.mod(df_idx, f32(no_sec)))
        buf_locked = jnp.where(row_df == posd, df, dfbuf)
        cnt_locked = jnp.minimum(df_cnt + 1.0, f32(no_sec))
        idx_locked = jnp.where(df_cnt < no_sec, df_idx,
                               jnp.mod(df_idx + 1.0, f32(no_sec)))
        buf_un = jnp.where(row_df == 0, df, jnp.zeros_like(dfbuf))
        dfbuf = jnp.where(locked > 0, buf_locked, buf_un)
        df_cnt = jnp.where(locked > 0, cnt_locked, 1.0)
        df_idx = jnp.where(locked > 0, idx_locked, 1.0)
        locked = jnp.where(
            (locked > 0) | (jnp.abs(phase_dev) < f32(
                cfg.pll_lock_threshold)), 1.0, 0.0)
        # virtual phase advance of the intra-step retune over this block
        dphi = dphi + phase_offset \
            + f32(2 * np.pi * cfg.ngps / cfg.sample_rate) * df_sum
        df_sum = df_sum + df

        outs_ref[b, 0:1, :] = amplitude
        outs_ref[b, 3:4, :] = locked
        outs_ref[b, 4:5, :] = sign0
        outs_ref[b, 5:6, :] = phase_offset
        outs_ref[b, 6:7, :] = jnp.zeros((1, c), f32)
        outs_ref[b, 7:8, :] = jnp.zeros((1, c), f32)

    # corr q/l rode [C, k] scratches; outs rows 1/2 get them with one
    # transpose each instead of two per block
    outs_ref[:, 1, :] = jnp.transpose(qbuf_ref[:, :])
    outs_ref[:, 2, :] = jnp.transpose(lbuf_ref[:, :])
    corr_cnt = jnp.transpose(cnt_c)
    corr_idx = jnp.transpose(idx_c)
    for i, v in enumerate([carry_re, carry_im, carry_cnt, sign0,
                           prev_sign, prev_sig, ms_time, std_dev, locked,
                           df_cnt, df_idx, corr_cnt, corr_idx, delay,
                           dphi, df_sum]):
        nstate_ref[i:i + 1, :] = v
    ndf_ref[:, :] = dfbuf
    ncorr_ref[:, :] = corrbuf


def cheap_stage_pallas(cfg: ReceiverConfig, k: int, states, heavy,
                       stream_no0):
    """Drop-in for vmap(channel_step_k) with identical result pytrees
    ([C, ...]-leading leaves); see ops/tracking.py for the contract."""
    from gps_sdr_tpu.ops.tracking import ChannelOut, ChannelState

    f32 = jnp.float32
    sl = cfg.n_cyc + 1
    n_ch = states.prn.shape[0]
    s0 = jnp.asarray(stream_no0).astype(jnp.int32)

    # erase semantics at the step's first block (stream gap)
    skipped = s0 - 1 != states.prev_stream
    erase = skipped & states.active
    sign0_in = jnp.where(erase, 0.0, states.sign0.astype(f32))
    psign_in = jnp.where(erase, 0.0, states.prev_sign.astype(f32))
    carry_re = jnp.where(erase, 0.0, jnp.real(states.carry_sum))
    carry_im = jnp.where(erase, 0.0, jnp.imag(states.carry_sum))
    carry_cnt = jnp.where(erase, 0.0, states.carry_cnt.astype(f32))

    # ms_time is a monotone ms counter; as a raw f32 row it would lose
    # integer precision past 2^24 ms (~4.7 h of lock).  The kernel only
    # ever ADDS a small per-step count (<= k*(n_cyc+1), exact in f32),
    # so carry it rebased to zero and add the int32 base back on exit —
    # the in-kernel value stays tiny for any session length.
    ms_base = states.ms_time.astype(jnp.int32)           # [C]
    state0 = jnp.stack([
        carry_re, carry_im, carry_cnt, sign0_in, psign_in,
        states.prev_signal, jnp.zeros((n_ch,), f32), states.std_dev,
        states.locked.astype(f32), states.df_cnt.astype(f32),
        states.df_idx.astype(f32), states.corr_cnt.astype(f32),
        states.corr_idx.astype(f32), heavy.wipe_delay[:, 0].astype(f32),
        jnp.zeros((n_ch,), f32), jnp.zeros((n_ch,), f32)], axis=0)
    wipe_t = jnp.moveaxis(heavy.wipe_delay.astype(f32), 0, 1)  # [k, C]

    # sums layout [K, 2*sl, C]: head_re, segs_re, head_im, segs_im
    head = jnp.moveaxis(heavy.head_k, 0, 1)            # [k, C]
    segs = jnp.moveaxis(heavy.seg_sums_k, 0, 1)        # [k, C, n_cyc]
    sums_t = jnp.concatenate([
        jnp.real(head)[:, None, :],
        jnp.moveaxis(jnp.real(segs), 2, 1),
        jnp.imag(head)[:, None, :],
        jnp.moveaxis(jnp.imag(segs), 2, 1)], axis=1)
    found_t = (heavy.delay_k >= 0).astype(f32)         # [C, k]
    dfbuf = jnp.moveaxis(states.df_buf, 0, 1)          # [no_sec, C]
    corrbuf = states.corr_buf.astype(f32)              # [C, hist]

    outs, edges, nstate, ndf, ncorr = cheap_stage_call(
        cfg, k, sums_t, found_t, wipe_t, state0, dfbuf, corrbuf)

    dphi = nstate[14]
    df_sum = nstate[15]
    new_freq = jnp.clip(states.freq + df_sum, cfg.min_freq, cfg.max_freq)
    new_phase = jnp.remainder(heavy.phase_end + dphi, f32(2 * np.pi))
    locked = nstate[8] > 0
    corr_q_last = outs[-1, 1]
    corr_cnt = nstate[11]
    sweep_request = ((corr_cnt >= cfg.corr_hist_len)
                     & (corr_q_last < cfg.min_corr_q) & states.active)

    computed = ChannelState(
        prn=states.prn, active=states.active, freq=new_freq,
        phase=new_phase,
        delay=heavy.new_delay_k[:, -1],
        locked=locked,
        ms_time=ms_base + nstate[6].astype(jnp.int32),
        std_dev=nstate[7],
        prev_stream=jnp.broadcast_to(s0 + k - 1, (n_ch,)),
        prev_signal=nstate[5],
        sign0=nstate[3].astype(jnp.int8),
        prev_sign=nstate[4].astype(jnp.int8),
        # de-rotate the stored carry tail by the step's accumulated PLL
        # correction: dphi folds into the NCO phase above, so next
        # step's mixed samples arrive already de-rotated while the raw
        # carry sums do not (ops/tracking.py channel_step_k, same fix)
        carry_sum=(jax.lax.complex(nstate[0], nstate[1])
                   * jax.lax.complex(jnp.cos(dphi), -jnp.sin(dphi))),
        carry_cnt=nstate[2].astype(jnp.int32),
        df_buf=jnp.moveaxis(ndf, 0, 1),
        df_cnt=nstate[9].astype(jnp.int32),
        df_idx=nstate[10].astype(jnp.int32),
        corr_buf=ncorr.astype(jnp.int8),
        corr_cnt=nstate[11].astype(jnp.int32),
        corr_idx=nstate[12].astype(jnp.int32))
    base = states._replace(
        prev_stream=jnp.broadcast_to(s0 + k - 1, (n_ch,)))
    new_states = jax.tree.map(
        lambda cmp, s: jnp.where(
            states.active.reshape((n_ch,) + (1,) * (cmp.ndim - 1)),
            cmp, s),
        computed, base)

    act = states.active[:, None]                        # [C, 1]
    # heavy leaves are [C, k] already; edges come back [k, 3*sl, C]
    e3 = lambda lo: jnp.transpose(edges[:, lo:lo + sl], (2, 0, 1))
    out = ChannelOut(
        code_phase=jnp.where(act, heavy.code_phase_k, -1.0),
        delay=jnp.where(act, heavy.new_delay_k, 0),
        norm_max=jnp.where(act, heavy.norm_max_k, 0.0),
        amplitude=jnp.where(act, jnp.moveaxis(outs[:, 0], 0, 1), 0.0),
        corr_q=jnp.where(act, jnp.moveaxis(outs[:, 1], 0, 1), 0.0),
        corr_l=jnp.where(act, jnp.moveaxis(outs[:, 2], 0, 1), 0.0),
        freq=jnp.where(act, jnp.broadcast_to(new_freq[:, None],
                                             (n_ch, k)), 0.0),
        locked=act & (jnp.moveaxis(outs[:, 3], 0, 1) > 0),
        erased=jnp.concatenate(
            [erase[:, None], jnp.zeros((n_ch, k - 1), bool)], axis=1)
        if k > 1 else erase[:, None],
        sweep_request=sweep_request[:, None]
        & (jnp.arange(k)[None, :] == k - 1),
        sign0=jnp.where(act, jnp.moveaxis(outs[:, 4], 0, 1),
                        0.0).astype(jnp.int8),
        edge_ms=ms_base[:, None, None] + e3(0).astype(jnp.int32),
        edge_local=e3(sl).astype(jnp.int32),
        edge_valid=(e3(2 * sl) > 0) & act[:, :, None])
    return new_states, out


@functools.partial(jax.jit, static_argnums=(0, 1))
def cheap_stage_call(cfg: ReceiverConfig, k: int, sums_t, found_t, wipe_t,
                     state0, dfbuf, corrbuf):
    """sums_t f32[K, 2*(n_cyc+1), C]; found_t f32[C, K]; wipe_t
    f32[K, C]; state0 f32[NS, C]; dfbuf f32[no_sec, C]; corrbuf
    f32[C, hist] (LANE-major — see the ring comment in the kernel)."""
    sl = cfg.n_cyc + 1
    c = state0.shape[-1]
    kern = functools.partial(_cheap_kernel, cfg, k)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((k, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((k, 3 * sl, c), jnp.float32),
            jax.ShapeDtypeStruct((NS, c), jnp.float32),
            jax.ShapeDtypeStruct((cfg.no_sec, c), jnp.float32),
            jax.ShapeDtypeStruct((c, cfg.corr_hist_len), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, k), jnp.float32),
            pltpu.VMEM((c, k), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(sums_t, found_t, wipe_t, state0, dfbuf, corrbuf)
