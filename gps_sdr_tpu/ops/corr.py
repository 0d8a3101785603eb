"""Transpose-free circular correlation + peak metrics for tracking.

The tracking correlator (heavy stage) computes, per (block, channel),
``corr = |idft(dft(center) * conj(code_fft))|`` followed by
mean/std/argmax peak metrics (dsp.circ_correlate + dsp.peak_metrics,
mirroring findCodePhase, reference src/gpslib.py:1293-1304).  Routed
through ops/dft.py's generic Cooley-Tukey matmul DFT, that chain
materializes six layout changes per step on TPU — the CT factorization
swapaxes the [b, a] view around every matmul, and the complex<->planar
conversions around the Pallas kernel add two more copies.  Profiled at
K=16 x 12 channels those reshape/copy ops were ~27% of tracking device
time (ROOFLINE_r03.json: reshape.409-411 + copy.178/179 vs while.36).

This module computes the same three peak metrics with ZERO materialized
transposes:

- planar f32 re/im throughout (the Pallas mix+wipeoff kernel already
  emits planar center segments; complex64 never appears);
- the CT stages contract over whichever axis holds the decimated index
  via `lax.dot_general` dimension numbers instead of swapaxes+matmul
  (the MXU streams either operand axis; XLA folds the layout into the
  operand load rather than a standalone HBM copy);
- the correlation is left PERMUTED: with n = a*b, forward output lands
  as X[k2, k1] (true frequency k = k1*b + k2) and the inverse lands as
  y[m1, m2] (true lag m = m2*a + m1).  The code spectrum is pre-permuted
  to match (prep_spec), the conjugate is folded into it, and the final
  un-permute transpose is never performed: mean/std/argmax/parabola-fit
  are computed in the permuted layout and only the argmax INDEX is
  remapped (p -> m, plus the two circular neighbours' permuted
  addresses for the sub-sample fit).
- the inverse's 1/n and the reference's normalizations are dropped:
  delay (argmax), norm_max ((peak-mean)/std) and the triangle/parabola
  code-phase fit (dsp.fit_peak, reference fitCodePhase
  src/gpslib.py:1268-1290) are all invariant under positive scaling.

On CPU (tests, interpret mode) the same API runs jnp.fft in natural
layout — equivalence between the two paths is pinned by
tests/test_corr.py with FORCE_MATMUL, exactly like ops/dft.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gps_sdr_tpu.ops import dsp
from gps_sdr_tpu.ops.dft import _factor2

Array = jax.Array

FORCE_MATMUL = False    # tests: exercise the permuted MXU path on CPU

_P = jax.lax.Precision.DEFAULT   # bf16 single-pass on TPU, same as the
                                 # dft.py path it replaces (f32 accum;
                                 # input rounding ~0.4%, far below the
                                 # 8-sigma correlator gate)


def _use_matmul() -> bool:
    return FORCE_MATMUL or jax.default_backend() != "cpu"


@functools.lru_cache(maxsize=None)
def _dft_pair(n: int, sign: float) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sign*sin) of the n-point DFT matrix, planar f32."""
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ang = 2.0 * np.pi * j * k / n
    return (np.cos(ang).astype(np.float32),
            (sign * np.sin(ang)).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _twiddle_pair(a: int, b: int, n: int,
                  sign: float) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sign*sin) of exp(sign*2*pi*i*r*c/n) for r in [a), c in [b)."""
    r, c = np.meshgrid(np.arange(a), np.arange(b), indexing="ij")
    ang = 2.0 * np.pi * r * c / n
    return (np.cos(ang).astype(np.float32),
            (sign * np.sin(ang)).astype(np.float32))


def _cdot(xr: Array, xi: Array, w, dim: int) -> tuple[Array, Array]:
    """Planar complex contraction of x's axis `dim` with w's axis 0.

    Output axes: x's non-contracted axes in order, then w's axis 1 —
    i.e. the contracted axis is REPLACED by the transformed axis at the
    trailing position, with no explicit transpose op.
    """
    wr, wi = (jnp.asarray(w[0]), jnp.asarray(w[1]))
    dn = (((dim,), (0,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            precision=_P,
                            preferred_element_type=jnp.float32)
    yr = dot(xr, wr) - dot(xi, wi)
    yi = dot(xr, wi) + dot(xi, wr)
    return yr, yi


def _cmul(xr, xi, wr, wi):
    return xr * wr - xi * wi, xr * wi + xi * wr


def prep_spec(code_ffts: Array, n: int) -> tuple[Array, Array]:
    """Pre-permute conj(code_fft) into the forward CT output layout.

    code_ffts: c64[..., n].  Returns planar ( re, im )[..., b, a] with
    S[k2, k1] = conj(code_fft)[k1*b + k2].  Hoist OUT of any scan: this
    is the only transpose of the pipeline, done once per channel set.
    On CPU the conj spectrum is returned un-permuted (natural fft path).
    """
    if not _use_matmul():
        c = jnp.conjugate(code_ffts)
        return jnp.real(c), jnp.imag(c)
    a, b = _factor2(n)
    lead = code_ffts.shape[:-1]
    sr = jnp.real(code_ffts).reshape(lead + (a, b))
    si = -jnp.imag(code_ffts).reshape(lead + (a, b))
    perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead))
    return jnp.transpose(sr, perm), jnp.transpose(si, perm)


def _corr_perm(xr: Array, xi: Array, spec, n: int) -> tuple[Array, Array]:
    """Permuted-layout circular correlation, planar in/out.

    xr/xi: f32[..., n]; spec from prep_spec.  Returns |.|^2's parts
    (yr, yi) as f32[..., a, b] with true lag m = m2*a + m1.
    """
    a, b = _factor2(n)
    lead = xr.shape[:-1]
    nb = len(lead) + 1          # axis index of the first of the 2 tail
    # forward: x[j], j = j2*a + j1 -> view [.., j2(b), j1(a)]
    xr2 = xr.reshape(lead + (b, a))
    xi2 = xi.reshape(lead + (b, a))
    # S[k2, j1] = sum_j2 x[j2, j1] W_b[j2, k2]  -> [.., j1(a), k2(b)]
    yr, yi = _cdot(xr2, xi2, _dft_pair(b, -1.0), nb - 1)
    tw1 = _twiddle_pair(a, b, n, -1.0)          # [j1, k2]
    yr, yi = _cmul(yr, yi, jnp.asarray(tw1[0]), jnp.asarray(tw1[1]))
    # X[k2, k1] = sum_j1 Y[j1, k2] W_a[j1, k1]  -> [.., k2(b), k1(a)]
    xr3, xi3 = _cdot(yr, yi, _dft_pair(a, -1.0), nb - 1)
    # conj-code multiply in the SAME [k2, k1] layout
    xr3, xi3 = _cmul(xr3, xi3, spec[0], spec[1])
    # inverse: contract k1 (minor) with V_a[k1, m1] -> [.., k2(b), m1(a)]
    gr, gi = _cdot(xr3, xi3, _dft_pair(a, +1.0), nb)
    tw2 = _twiddle_pair(b, a, n, +1.0)          # [k2, m1]
    gr, gi = _cmul(gr, gi, jnp.asarray(tw2[0]), jnp.asarray(tw2[1]))
    # y[m1, m2] = sum_k2 G[k2, m1] V_b[k2, m2]  -> [.., m1(a), m2(b)]
    return _cdot(gr, gi, _dft_pair(b, +1.0), nb - 1)


def _peak_metrics_flat(corr: Array, corr_min: float, delay_of, nbr_of
                       ) -> tuple[Array, Array, Array]:
    """dsp.peak_metrics over the last axis of corr[..., n], with index
    remap hooks: delay_of(p) -> true lag, nbr_of(m) -> flat address."""
    n = corr.shape[-1]
    mean = jnp.mean(corr, axis=-1)
    std = jnp.std(corr, axis=-1)
    p = jnp.argmax(corr, axis=-1)
    m = delay_of(p)

    def take(idx):
        return jnp.take_along_axis(corr, idx[..., None], axis=-1)[..., 0]

    c0 = take(p)
    cm = take(nbr_of((m - 1) % n))
    cp = take(nbr_of((m + 1) % n))
    norm_max = (c0 - mean) / std
    found = norm_max > corr_min
    # dsp.fit_peak: mean of triangle + parabola sub-sample fits
    tri = jnp.where(cm > cp,
                    0.5 * (cp - cm) / (c0 - cp),
                    0.5 * (cp - cm) / (c0 - cm))
    par = 0.5 * (cp - cm) / (2.0 * c0 - cp - cm)
    code_phase = m.astype(jnp.float32) + 0.5 * (tri + par)
    delay = jnp.where(found, m.astype(jnp.int32), jnp.int32(-1))
    code_phase = jnp.where(found, code_phase, jnp.float32(-1.0))
    return delay, code_phase, norm_max


def corr_peaks(xr: Array, xi: Array, spec, corr_min: float
               ) -> tuple[Array, Array, Array]:
    """(delay, code_phase, norm_max) over the last axis.

    xr/xi: planar f32[..., n] segment means (already averaged);
    spec: prep_spec(code_ffts, n) broadcastable against the lead axes.
    Equivalent to dft-then-dsp.circ_correlate-then-dsp.peak_metrics per
    row, without any materialized transpose on the accelerator path.
    """
    n = xr.shape[-1]
    if not _use_matmul():
        x = jax.lax.complex(xr, xi)
        s = jax.lax.complex(spec[0], spec[1])
        corr = jnp.abs(jnp.fft.ifft(jnp.fft.fft(x, axis=-1) * s, axis=-1)
                       ).astype(jnp.float32)
        ident = lambda i: i
        return _peak_metrics_flat(corr, corr_min, ident, ident)
    a, b = _factor2(n)
    yr, yi = _corr_perm(xr, xi, spec, n)
    corr = jnp.sqrt(yr * yr + yi * yi)
    corr = corr.reshape(corr.shape[:-2] + (n,))   # flat p = m1*b + m2
    delay_of = lambda p: (p % b) * a + p // b
    nbr_of = lambda m: (m % a) * b + m // a
    return _peak_metrics_flat(corr, corr_min, delay_of, nbr_of)
