"""Pallas TPU kernels for the tracking hot path.

The K-block heavy stage (ops/tracking.py heavy_channel_k) is, in XLA, a
chain of ~15 elementwise/reduction ops that each materialize a
[channels, K*65536] intermediate in HBM; at 12 channels the stage is
op-launch- and HBM-bound.  The fused kernel performs NCO generation,
Doppler mixing, code wipeoff, and the per-ms segment sums for ALL
channels in one VMEM pass per block:

    HBM traffic per block:  one 512 KB block read + ~1.6 MB of outputs
    (the 8 center code periods per channel for the MXU correlation,
    and 33 complex sums per channel), instead of ~20 MB of XLA
    intermediates.

The DFT correlation itself stays in XLA — it is two MXU matmuls, which
is exactly where XLA is already optimal.

Numerics match the XLA path to f32 rounding: the oscillator uses the
same Q x R factorization as dsp.doppler_mix (evaluated per block with a
mod-2*pi per-block base so angles stay small).

Layout notes (Mosaic): refs are kept rank <= 4 with a 128-multiple
last dimension, all writes are >= 2-D tiles, and iota is integer-typed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gps_sdr_tpu.config import ReceiverConfig
from gps_sdr_tpu.ops import dsp

Array = jax.Array

SUMS_PAD = 128   # lanes; holds the n_cyc+1 (<=128) wipeoff sums per row


def _mix_wipeoff_kernel(cfg: ReceiverConfig, n_ch: int, params_ref,
                        delays_ref, block_ref, codes_ref, center_ref,
                        sums_ref):
    """One grid step = one 32 ms block, all channels.

    params_ref: SMEM f32[n_ch, 4] = (s, base_phase_b0, snp, delay)
        s    = 2*pi*freq/fs  (rad/sample)
        base = carrier phase at the step's first sample, per channel
        snp  = (s * ngps) mod 2*pi  (per-block phase advance)
    delays_ref: SMEM i32[n_ch, 1]           (code delays, for the roll;
                2-D so the spec stays legal under vmap batching)
    block_ref:  VMEM f32[1, 2, n_cyc, cs]   (re plane, im plane)
    codes_ref:  VMEM f32[n_ch, cs]          (unrolled C/A codes; the
                delay roll runs in-register — the FFT-domain roll it
                replaces was ~9% of tracking device time)
    center_ref: VMEM f32[1, n_ch*2, cs]
                row 2c = re, 2c+1 = im of the MEAN of the corr_avg
                center code periods (DFT linearity: the correlator
                averages segment DFTs == DFT of the mean segment)
    sums_ref:   VMEM f32[1, n_ch*2, SUMS_PAD]
                row 2c = re, 2c+1 = im; cols 0..n_cyc = head + segs
    """
    cs, n_cyc, ca = cfg.code_samples, cfg.n_cyc, cfg.corr_avg
    first_seg = (n_cyc - ca) // 2
    b = pl.program_id(0).astype(jnp.float32)

    br = block_ref[0, 0]                              # [n_cyc, cs]
    bi = block_ref[0, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1) \
        .astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_cyc, 1), 0) \
        .astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUMS_PAD), 1)

    for c in range(n_ch):
        s = params_ref[c, 0]
        base = params_ref[c, 1] + params_ref[c, 2] * b
        # factorized NCO: ang(q, r) = (base + s*(r+1)) + (s*cs)*q
        ang_r = base + s * (col + 1.0)                    # [1, cs]
        ang_q = (s * jnp.float32(cs)) * row               # [n_cyc, 1]
        cr, sr = jnp.cos(ang_r), jnp.sin(ang_r)
        cq, sq = jnp.cos(ang_q), jnp.sin(ang_q)
        osc_re = cq * cr - sq * sr                        # cos(total)
        osc_im = sq * cr + cq * sr                        # sin(total)
        # mixed = block * exp(-i ang)
        m_re = br * osc_re + bi * osc_im
        m_im = bi * osc_re - br * osc_im

        inv = jnp.float32(1.0 / ca)
        center_ref[0, 2 * c:2 * c + 1, :] = inv * jnp.sum(
            m_re[first_seg:first_seg + ca, :], axis=0, keepdims=True)
        center_ref[0, 2 * c + 1:2 * c + 2, :] = inv * jnp.sum(
            m_im[first_seg:first_seg + ca, :], axis=0, keepdims=True)

        code = pltpu.roll(codes_ref[c:c + 1, :],
                          shift=delays_ref[c, 0], axis=1)    # [1, cs]
        p_re = m_re * code
        p_im = m_im * code
        dmask = (col < params_ref[c, 3]).astype(jnp.float32)
        lo_re = jnp.sum(p_re * dmask, axis=1, keepdims=True)  # [n_cyc,1]
        lo_im = jnp.sum(p_im * dmask, axis=1, keepdims=True)
        hi_re = jnp.sum(p_re, axis=1, keepdims=True) - lo_re
        hi_im = jnp.sum(p_im, axis=1, keepdims=True) - lo_im

        def pack(lo, hi):
            # [1, SUMS_PAD]: col 0 = head = lo[0]; col 1+k = hi[k] +
            # lo[k+1] (last segment has no following head)
            z = jnp.zeros((1, 1), jnp.float32)
            seg = hi + jnp.concatenate([lo[1:], z], axis=0)   # [n_cyc,1]
            v = jnp.concatenate([lo[0:1], seg], axis=0)       # [n_cyc+1,1]
            v = jnp.concatenate(
                [v, jnp.zeros((SUMS_PAD - n_cyc - 1, 1), jnp.float32)],
                axis=0)
            return v.reshape(1, SUMS_PAD)

        sums_ref[0, 2 * c:2 * c + 1, :] = pack(lo_re, hi_re)
        sums_ref[0, 2 * c + 1:2 * c + 2, :] = pack(lo_im, hi_im)

    del lane  # (kept for clarity of the SUMS_PAD layout)


@functools.partial(jax.jit, static_argnums=(0, 1))
def mix_wipeoff(cfg: ReceiverConfig, k: int, params: Array, delays: Array,
                blocks2: Array, codes: Array) -> tuple[Array, Array]:
    """Fused mix + code wipeoff for k blocks x n_ch channels.

    params:  f32[n_ch, 4] (see kernel docstring)
    delays:  i32[n_ch, 1]
    blocks2: f32[k, 2, n_cyc, cs]
    codes:   f32[n_ch, cs] (unrolled)
    Returns (center f32[k, n_ch*2, cs]  (mean center segment),
             sums   f32[k, n_ch*2, SUMS_PAD]).
    """
    n_ch = params.shape[0]
    cs, n_cyc = cfg.code_samples, cfg.n_cyc
    ca = cfg.corr_avg
    kern = functools.partial(_mix_wipeoff_kernel, cfg, n_ch)
    return pl.pallas_call(
        kern,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, n_cyc, cs), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_ch * 2, cs), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ch * 2, SUMS_PAD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, n_ch * 2, cs), jnp.float32),
            jax.ShapeDtypeStruct((k, n_ch * 2, SUMS_PAD), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(params, delays, blocks2, codes)


def heavy_stage_pallas(cfg: ReceiverConfig, k: int, states, blocks: Array,
                       codes: Array, code_ffts: Array):
    """Drop-in replacement for the XLA heavy stage (ops/tracking.py):
    Pallas mix+wipeoff kernel + MXU DFT correlation."""
    from gps_sdr_tpu.ops.tracking import HeavyOut

    fs = cfg.sample_rate
    cs, n_cyc, ngps = cfg.code_samples, cfg.n_cyc, cfg.ngps
    ca = cfg.corr_avg
    n_ch = states.freq.shape[0]
    freq, phase, delay0 = states.freq, states.phase, states.delay

    s = jnp.float32(2.0 * np.pi) * freq / jnp.float32(fs)
    snp = jnp.remainder(s * ngps, jnp.float32(2.0 * np.pi))
    params = jnp.stack(
        [s, phase, snp, delay0.astype(jnp.float32)], axis=1)

    if dsp.is_planar_input(blocks):        # f32[k, 2, ngps]: free reshape
        blocks2 = blocks.reshape(k, 2, n_cyc, cs)
    else:                                  # c64[k, ngps]: X64Split cost
        blocks2 = jnp.stack([jnp.real(blocks), jnp.imag(blocks)],
                            axis=1).reshape(k, 2, n_cyc, cs)
    center, sums = mix_wipeoff(cfg, k, params, delay0[:, None],
                               blocks2, codes)

    # correlation on the MXU (XLA); center is already the mean segment
    center = center.reshape(k, n_ch, 2, cs)
    center_c = jax.lax.complex(center[:, :, 0], center[:, :, 1])
    fft_mean = dsp.dft(center_c)                          # [k, C, cs]
    corr = dsp.circ_correlate(fft_mean, code_ffts[None, :, :])
    delay_k, code_phase_k, norm_max_k = jax.vmap(jax.vmap(
        lambda cr: dsp.peak_metrics(cr, cfg.corr_min)))(corr)

    def res_delay(prev, d):
        nd = jnp.where(d >= 0, d, prev)
        return nd, nd

    _, new_delay_k = jax.lax.scan(res_delay, delay0, delay_k)

    sums = sums.reshape(k, n_ch, 2, SUMS_PAD)[:, :, :, :n_cyc + 1]
    sums_c = jax.lax.complex(sums[:, :, 0], sums[:, :, 1])  # [k, C, 33]
    head_k = jnp.moveaxis(sums_c[:, :, 0], 0, -1)           # [C, k]
    seg_sums_k = jnp.moveaxis(sums_c[:, :, 1:], 0, 1)       # [C, k, n_cyc]
    phase_end = jnp.remainder(phase + snp * k, jnp.float32(2.0 * np.pi))

    # per-channel leading axis (the cheap stage is vmapped over C)
    return HeavyOut(
        delay_k=jnp.moveaxis(delay_k, 0, 1),
        code_phase_k=jnp.moveaxis(code_phase_k, 0, 1),
        norm_max_k=jnp.moveaxis(norm_max_k, 0, 1),
        new_delay_k=jnp.moveaxis(new_delay_k, 0, 1),
        head_k=head_k,
        seg_sums_k=seg_sums_k,
        phase_end=phase_end,
        wipe_delay=delay0,
    )
