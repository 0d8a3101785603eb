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
from gps_sdr_tpu.ops import corr, dsp

Array = jax.Array

SUMS_PAD = 128   # lanes; holds the n_cyc+1 (<=128) wipeoff sums per row


def _mix_wipeoff_kernel(cfg: ReceiverConfig, n_ch: int, params_ref,
                        delays_ref, block_ref, codes_ref, center_ref,
                        sums_ref):
    """One grid step = one 32 ms block, all channels.

    params_ref: SMEM f32[n_ch, 4] = (s, base_phase_b0, snp, delay0)
        s    = 2*pi*freq/fs  (rad/sample)
        base = carrier phase at the step's first sample, per channel
        snp  = (s * ngps) mod 2*pi  (per-block phase advance)
        delay0 is UNUSED here (kept for layout); all wipeoff masks and
        rolls come from the per-block delays_ref
    delays_ref: SMEM i32[n_ch, k]  per-block wipeoff delays (the code
                Doppler drifts the boundary ~0.13 samples/block per
                3 kHz of carrier Doppler — ops/tracking.py
                predict_wipe_delays)
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
    bi_idx = pl.program_id(0)
    b = bi_idx.astype(jnp.float32)

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

        wipe = delays_ref[c, bi_idx]
        code = pltpu.roll(codes_ref[c:c + 1, :],
                          shift=wipe, axis=1)                # [1, cs]
        p_re = m_re * code
        p_im = m_im * code
        dmask = (col < wipe.astype(jnp.float32)).astype(jnp.float32)
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
    delays:  i32[n_ch, k] (per-block wipeoff delays)
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


def _mxu_wipeoff_kernel(cfg: ReceiverConfig, n_ch: int, step_ref,
                        params_ref, delays_ref, svec_ref, dcol_ref,
                        rotrow_ref, rotcol_ref,
                        g_ref, cqsq_ref, block_ref, codes_ref,
                        cre_ref, cim_ref, sums_ref, c0s0_ref, wt_ref,
                        rolled_ref):
    """MXU formulation of mix + code wipeoff, one grid step per block.

    The per-sample oscillator factorizes exactly: with j = q*cs + i,
    ang = base_b + s*cs*q + s*(i+1), so every per-period wipeoff sum
    sum_i mixed[q,i]*code[i] is a lane contraction of the RAW block
    planes against four block-invariant weight rows per channel
    (w1 = code*cos(s*(i+1)), w2 = code*sin, and their head-masked
    variants), combined per row with cos/sin(s*cs*q) and per block with
    cos/sin(base_b).  Likewise the center mean is a row contraction
    with cq/sq weights combined with c0/s0 lanes.  The VPU version
    materialized the [n_cyc, cs] oscillator and mixed planes per
    channel (~16 M VPU ops/block at 12 channels); here the same sums
    are two MXU passes over the block (~1 M VPU ops/block).

    inputs (per grid step b):
      step   scalar-prefetch i32[1]: which K-block step of the FULL
             chunk this call processes — the block DMA indexes
             blocks[step*k + b] directly from the chunk in HBM, so the
             caller's scan never materializes a per-step K-block slice
             (the XLA dynamic-slice it replaces was ~8% of tracking
             device time, ROOFLINE_r03.json constant_dynamic-slice)
      params SMEM f32[C, 4] (s, phase0, snp, delay0 — delay0
             unused, kept for layout; masks/rolls use delays_ref)
      delays SMEM i32[C, k]  per-block wipeoff delays (roll shifts)
      svec   VMEM f32[C, 1]  params[:, 0] as a column — lets the
             oscillator tables build as TWO dense [C, cs] ops instead
             of 2C sublane-starved [1, cs] rows
      dcol   VMEM f32[1, C, 1] this block's wipeoff delays as a column
             (same batching for the head mask)
      rotrow VMEM f32[1, 2, C]    cos/sin(base_b) as rows
      rotcol VMEM f32[1, 2C, 1]   same, as columns
      g      VMEM f32[2C, n_cyc]  center-mask-scaled cq/sq row weights
      cqsq   VMEM f32[2, n_cyc, C] cos/sin(s*cs*q) in lane-major layout
      block  VMEM f32[1, 2, n_cyc, cs]
      codes  VMEM f32[C, cs]
    outputs:
      cre/cim VMEM f32[1, C, cs]         mean center segment re / im —
                                         SEPARATE planes so the
                                         downstream planar correlation
                                         (ops/corr.py) reads contiguous
                                         arrays with no slice/copy
      sums   VMEM f32[1, 2*(n_cyc+1), C] rows: head_re, seg_re[n_cyc],
                                         head_im, seg_im[n_cyc]
    scratch (persist across the sequential grid; built at b == 0):
      c0s0 f32[2C, cs]; wt f32[4C, cs]; rolled f32[C, cs]
    """
    cs, n_cyc = cfg.code_samples, cfg.n_cyc
    c = n_ch
    sl = n_cyc + 1
    f32 = jnp.float32
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        col0 = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1).astype(f32)
        ar = svec_ref[:, :] * (col0 + 1.0)                # [C, cs]
        c0s0_ref[0:c, :] = jnp.cos(ar)
        c0s0_ref[c:2 * c, :] = jnp.sin(ar)

    # code-dependent weights follow the per-block wipeoff delay (code
    # Doppler drift, ops/tracking.py predict_wipe_delays).  The rolls
    # are per-channel (pltpu.roll takes one scalar shift); everything
    # else is batched over the channel axis — 4 dense [C, cs] ops + one
    # mask instead of ~6C sublane-starved [1, cs] row ops per block.
    for ch in range(c):
        rolled_ref[ch:ch + 1, :] = pltpu.roll(
            codes_ref[ch:ch + 1, :], shift=delays_ref[ch, b], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1).astype(f32)
    dm = (col < dcol_ref[0]).astype(f32)                  # [C, cs]
    rolled = rolled_ref[:, :]
    wt_ref[0:c, :] = rolled * c0s0_ref[0:c, :]
    wt_ref[c:2 * c, :] = rolled * c0s0_ref[c:2 * c, :]
    wt_ref[2 * c:3 * c, :] = wt_ref[0:c, :] * dm
    wt_ref[3 * c:4 * c, :] = wt_ref[c:2 * c, :] * dm

    br = block_ref[0, 0]                                  # [n_cyc, cs]
    bi = block_ref[0, 1]

    def nt(x, w):                       # x[q, i] . w[r, i] -> [q, r]
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            # bf16 single-pass: the wipeoff sums accumulate in f32 and
            # the bf16 input rounding adds ~0.6% of the THERMAL noise
            # (products are unit-scale samples x +-1 code); HIGHEST's
            # 6-pass decomposition cost ~3.6 us/block of the ~21
            # us/block step (measured by ablation on a v5e)
            precision=jax.lax.Precision.DEFAULT)

    w1 = wt_ref[0:c, :]
    w2 = wt_ref[c:2 * c, :]
    w1m = wt_ref[2 * c:3 * c, :]
    w2m = wt_ref[3 * c:4 * c, :]
    cq = cqsq_ref[0]                                      # [n_cyc, C]
    sq = cqsq_ref[1]

    def xy(a1, a2, a3, a4):
        e = a1 + a4
        f = a3 - a2
        return cq * e + sq * f, cq * f - sq * e

    x_f, y_f = xy(nt(br, w1), nt(br, w2), nt(bi, w1), nt(bi, w2))
    x_m, y_m = xy(nt(br, w1m), nt(br, w2m), nt(bi, w1m), nt(bi, w2m))

    cbr = rotrow_ref[0, 0:1, :]                           # [1, C]
    sbr = rotrow_ref[0, 1:2, :]
    lo_re = cbr * x_m + sbr * y_m                         # [n_cyc, C]
    lo_im = cbr * y_m - sbr * x_m
    hi_re = (cbr * x_f + sbr * y_f) - lo_re
    hi_im = (cbr * y_f - sbr * x_f) - lo_im
    z = jnp.zeros((1, c), f32)
    seg_re = hi_re + jnp.concatenate([lo_re[1:], z], axis=0)
    seg_im = hi_im + jnp.concatenate([lo_im[1:], z], axis=0)
    sums_ref[0, 0:1, :] = lo_re[0:1]
    sums_ref[0, 1:sl, :] = seg_re
    sums_ref[0, sl:sl + 1, :] = lo_im[0:1]
    sums_ref[0, sl + 1:2 * sl, :] = seg_im

    hp = functools.partial(jnp.dot, preferred_element_type=f32,
                           precision=jax.lax.Precision.DEFAULT)
    p_br = hp(g_ref[:, :], br)                            # [2C, cs]
    p_bi = hp(g_ref[:, :], bi)
    e2 = p_br[0:c] + p_bi[c:2 * c]
    f2 = p_bi[0:c] - p_br[c:2 * c]
    c0 = c0s0_ref[0:c, :]
    s0 = c0s0_ref[c:2 * c, :]
    u = c0 * e2 + s0 * f2
    v = c0 * f2 - s0 * e2
    cbc = rotcol_ref[0, 0:c, 0:1]                         # [C, 1]
    sbc = rotcol_ref[0, c:2 * c, 0:1]
    cre_ref[0] = cbc * u + sbc * v
    cim_ref[0] = cbc * v - sbc * u


@functools.partial(jax.jit, static_argnums=(0, 1))
def mix_wipeoff_mxu(cfg: ReceiverConfig, k: int, step: Array,
                    params: Array, delays: Array, rotrow: Array,
                    rotcol: Array, g: Array, cqsq: Array, blocks2: Array,
                    codes: Array) -> tuple[Array, Array, Array]:
    """MXU-contraction mix + wipeoff (see _mxu_wipeoff_kernel).

    blocks2 holds the WHOLE chunk, f32[T, 2, n_cyc, cs]; `step`
    (i32[1], scalar-prefetched) selects which K-block window the call
    processes — the kernel DMAs blocks2[step*k + b] per grid step, so
    the caller never slices.  Returns (center_re f32[k, C, cs],
    center_im f32[k, C, cs], sums f32[k, 2*(n_cyc+1), C])."""
    n_ch = params.shape[0]
    cs, n_cyc = cfg.code_samples, cfg.n_cyc
    sl = n_cyc + 1
    kern = functools.partial(_mxu_wipeoff_kernel, cfg, n_ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # svec [C, 1]
            pl.BlockSpec((1, n_ch, 1), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),          # dcol
            pl.BlockSpec((1, 2, n_ch), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * n_ch, 1), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_cyc, cs),
                         lambda b, s: (s[0] * k + b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_ch, cs), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ch, cs), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * sl, n_ch), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * n_ch, cs), jnp.float32),
            pltpu.VMEM((4 * n_ch, cs), jnp.float32),
            pltpu.VMEM((n_ch, cs), jnp.float32),
        ],
    )
    svec = params[:, 0:1]                                  # [C, 1]
    dcol = delays.T.astype(jnp.float32)[:, :, None]        # [k, C, 1]
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k, n_ch, cs), jnp.float32),
            jax.ShapeDtypeStruct((k, n_ch, cs), jnp.float32),
            jax.ShapeDtypeStruct((k, 2 * sl, n_ch), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(step, params, delays, svec, dcol, rotrow, rotcol, g, cqsq,
      blocks2, codes)


def heavy_stage_pallas(cfg: ReceiverConfig, k: int, states, blocks: Array,
                       codes: Array, code_ffts: Array, corr_spec=None,
                       step=None):
    """Drop-in replacement for the XLA heavy stage (ops/tracking.py):
    Pallas mix+wipeoff kernel + MXU correlation.

    corr_spec: optional pre-permuted conj code spectrum
    (ops/corr.py prep_spec) — pass it from outside a scan so the
    permute isn't re-done every step; derived from code_ffts here
    otherwise.
    step: optional traced i32 K-block step index.  When given, `blocks`
    is the WHOLE planar chunk f32[T, 2, ngps] and the kernel DMAs its
    K-block window itself (scalar prefetch) — the caller's scan passes
    only the index, never a slice.  When None, blocks is one step's
    [k, 2, ngps] (or c64[k, ngps]) as before."""
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
    from gps_sdr_tpu.ops.tracking import predict_wipe_delays
    wipe = jax.vmap(lambda f, d: predict_wipe_delays(cfg, k, f, d))(
        freq, delay0)                                     # i32[C, k]

    if step is not None:                   # full planar chunk, in-kernel
        t = blocks.shape[0]                # window DMA (mxu kernel); the
        blocks2 = blocks.reshape(t, 2, n_cyc, cs)   # vpu kernel slices
        if not cfg.use_mxu_wipeoff:
            blocks2 = jax.lax.dynamic_slice_in_dim(blocks2, step * k, k)
        step_arr = jnp.asarray(step, jnp.int32).reshape(1)
    elif dsp.is_grouped_iq(cfg, blocks) or dsp.is_planar_input(blocks):
        blocks2 = blocks.reshape(k, 2, n_cyc, cs)  # grouped: identity
        step_arr = jnp.zeros((1,), jnp.int32)
    else:                                  # c64[k, ngps]: X64Split cost
        blocks2 = jnp.stack([jnp.real(blocks), jnp.imag(blocks)],
                            axis=1).reshape(k, 2, n_cyc, cs)
        step_arr = jnp.zeros((1,), jnp.int32)

    if cfg.use_mxu_wipeoff:
        base = phase[None, :] + snp[None, :] * jnp.arange(
            k, dtype=jnp.float32)[:, None]                # [k, C]
        rotrow = jnp.stack([jnp.cos(base), jnp.sin(base)], axis=1)
        rotcol = rotrow.reshape(k, 2 * n_ch, 1)
        q = jnp.arange(n_cyc, dtype=jnp.float32)
        angq = s[:, None] * jnp.float32(cs) * q[None, :]  # [C, n_cyc]
        cq_r, sq_r = jnp.cos(angq), jnp.sin(angq)
        first_seg = (n_cyc - ca) // 2
        cmask = (((q >= first_seg) & (q < first_seg + ca))
                 .astype(jnp.float32) / jnp.float32(ca))[None, :]
        g = jnp.concatenate([cq_r * cmask, sq_r * cmask], axis=0)
        cqsq = jnp.stack([cq_r.T, sq_r.T])                # [2, n_cyc, C]
        center_re, center_im, sums2 = mix_wipeoff_mxu(
            cfg, k, step_arr, params, wipe, rotrow, rotcol, g, cqsq,
            blocks2, codes)
        sl = n_cyc + 1
        head_k = jnp.moveaxis(jax.lax.complex(
            sums2[:, 0], sums2[:, sl]), 0, 1)              # [C, k]
        seg_sums_k = jnp.transpose(jax.lax.complex(
            sums2[:, 1:sl], sums2[:, sl + 1:2 * sl]), (2, 0, 1))
    else:
        center, sums = mix_wipeoff(cfg, k, params, wipe,
                                   blocks2, codes)
        center = center.reshape(k, n_ch, 2, cs)
        center_re, center_im = center[:, :, 0], center[:, :, 1]
        sums = sums.reshape(k, n_ch, 2, SUMS_PAD)[:, :, :, :n_cyc + 1]
        sums_c = jax.lax.complex(sums[:, :, 0], sums[:, :, 1])
        head_k = jnp.moveaxis(sums_c[:, :, 0], 0, -1)       # [C, k]
        seg_sums_k = jnp.moveaxis(sums_c[:, :, 1:], 0, 1)   # [C, k, n_cyc]

    # transpose-free planar correlation + permuted-layout peak metrics
    # (ops/corr.py); center is already the mean segment
    if corr_spec is None:
        corr_spec = corr.prep_spec(code_ffts, cs)
    delay_k, code_phase_k, norm_max_k = corr.corr_peaks(
        center_re, center_im, corr_spec, cfg.corr_min)    # [k, C]

    def res_delay(prev, d):
        nd = jnp.where(d >= 0, d, prev)
        return nd, nd

    _, new_delay_k = jax.lax.scan(res_delay, delay0, delay_k)

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
        wipe_delay=wipe,
    )
