"""MXU-native DFT: the 2048-point transform as a matrix multiply.

The correlation pipeline needs forward/inverse DFTs of length
code_samples (2048).  On TPU the FFT primitive is not the right tool
even where available: a [B, 2048] x [2048, 2048] matmul runs on the
systolic array at full throughput, batches all channels/segments/Doppler
bins into one op, and fuses with the surrounding elementwise work —
2048-point DFT-as-matmul costs ~17 MFLOP/row, which at TPU matmul rates
is far below the HBM-bandwidth cost of even touching the block
(SURVEY.md section 7: "this is the #1 hot kernel").  On CPU (tests) we
keep jnp.fft.  Dispatch happens at trace time via the default backend.

The DFT matrix is symmetric (W[j,k] = exp(-2*pi*i*j*k/n)), so row-vector
convention x @ W equals the standard DFT; the inverse uses
idft(X) = conj(dft(conj(X))) / n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _dft_matrix(n: int) -> np.ndarray:
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return np.exp(-2j * np.pi * j * k / n).astype(np.complex64)


FORCE_MATMUL = False    # tests: exercise the MXU path on the CPU backend
MAX_DIRECT = 1024       # largest single-matmul DFT; above this the
                        # four-step Cooley-Tukey factorization is used.
                        # Originally only a memory guard (an n x n matrix
                        # at n=16384 would be 2 GB), but CT also wins on
                        # FLOPs ~n/(a+b): at n=2048 it cut the tracking
                        # correlation from ~4.5 to ~1.8 ms per 1024
                        # blocks on a v5e (profiled), so it is the
                        # default for every n above one MXU tile's worth


BF16_MATMUL = False     # bf16 matmul inputs with f32 accumulation: the
                        # MXU runs bf16 at ~4x its f32 rate and the DFT
                        # sum accumulates in f32, so the only loss is
                        # ~2^-8 relative input quantization (~0.4%) —
                        # far below the correlator's 8-sigma peak gate
                        # and the thermal-noise code-phase jitter.
                        # Trace-time flag; set before first compile.


def _use_matmul() -> bool:
    # trace-time decision: tests force the cpu backend (pocketfft wins
    # there); any accelerator gets the MXU path
    return FORCE_MATMUL or jax.default_backend() != "cpu"


def _cmatmul(x: Array, w: Array) -> Array:
    """Complex matmul over the last axis, optionally with bf16 inputs
    and f32 accumulation (BF16_MATMUL)."""
    if not BF16_MATMUL:
        return jnp.matmul(x, w, preferred_element_type=jnp.complex64)
    bf16, f32 = jnp.bfloat16, jnp.float32
    xr = jnp.real(x).astype(bf16)
    xi = jnp.imag(x).astype(bf16)
    wr = jnp.real(w).astype(bf16)
    wi = jnp.imag(w).astype(bf16)
    yr = (jnp.matmul(xr, wr, preferred_element_type=f32)
          - jnp.matmul(xi, wi, preferred_element_type=f32))
    yi = (jnp.matmul(xr, wi, preferred_element_type=f32)
          + jnp.matmul(xi, wr, preferred_element_type=f32))
    return jax.lax.complex(yr, yi)


def _factor2(n: int) -> tuple[int, int]:
    a = int(np.sqrt(n))
    while n % a:
        a -= 1
    return a, n // a


@functools.lru_cache(maxsize=None)
def _twiddles(a: int, b: int) -> np.ndarray:
    j1, k2 = np.meshgrid(np.arange(a), np.arange(b), indexing="ij")
    return np.exp(-2j * np.pi * j1 * k2 / (a * b)).astype(np.complex64)


def _dft_matmul(x: Array) -> Array:
    """DFT along the last axis as MXU matmuls.

    n <= MAX_DIRECT: one [n, n] matmul.  Larger n: four-step
    Cooley-Tukey with n = a*b — b-point DFTs, twiddles, a-point DFTs —
    so a 16384-point transform runs as two 128-wide matmul stages
    instead of one infeasible 16384^2 matrix.
    """
    n = x.shape[-1]
    if n <= MAX_DIRECT:
        w = jnp.asarray(_dft_matrix(n))
        return _cmatmul(x, w)
    a, b = _factor2(n)
    lead = x.shape[:-1]
    # j = j2*a + j1  ->  view [.., j2, j1] = [.., b, a]
    xm = x.reshape(lead + (b, a))
    wb = jnp.asarray(_dft_matrix(b))
    # DFT over j2 (axis -2): Y[k2, j1] — as a matmul over the last axis
    y = jnp.swapaxes(_cmatmul(jnp.swapaxes(xm, -1, -2), wb), -1, -2)
    tw = jnp.asarray(_twiddles(a, b))          # [a, b] indexed [j1, k2]
    y = y * jnp.swapaxes(tw, 0, 1)             # [.., k2, j1]
    wa = jnp.asarray(_dft_matrix(a))
    # DFT over j1 (axis -1): X[k2, k1]; final index k = k1*b + k2
    z = _cmatmul(y, wa)
    return jnp.swapaxes(z, -1, -2).reshape(lead + (n,))


def dft(x: Array) -> Array:
    """DFT along the last axis (complex64 in/out)."""
    if not _use_matmul():
        return jnp.fft.fft(x, axis=-1).astype(jnp.complex64)
    return _dft_matmul(x)


def idft(x: Array) -> Array:
    """Inverse DFT along the last axis (complex64 in/out)."""
    n = x.shape[-1]
    if not _use_matmul():
        return jnp.fft.ifft(x, axis=-1).astype(jnp.complex64)
    return jnp.conj(_dft_matmul(jnp.conj(x))) * jnp.complex64(1.0 / n)
