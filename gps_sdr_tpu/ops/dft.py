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


def _use_matmul() -> bool:
    # trace-time decision: tests force the cpu backend (pocketfft wins
    # there); any accelerator gets the MXU path
    return jax.default_backend() != "cpu"


def dft(x: Array) -> Array:
    """DFT along the last axis (complex64 in/out)."""
    n = x.shape[-1]
    if not _use_matmul():
        return jnp.fft.fft(x, axis=-1).astype(jnp.complex64)
    w = jnp.asarray(_dft_matrix(n))
    return jnp.matmul(x, w, preferred_element_type=jnp.complex64)


def idft(x: Array) -> Array:
    """Inverse DFT along the last axis (complex64 in/out)."""
    n = x.shape[-1]
    if not _use_matmul():
        return jnp.fft.ifft(x, axis=-1).astype(jnp.complex64)
    w = jnp.asarray(_dft_matrix(n))
    return jnp.conj(jnp.matmul(jnp.conj(x), w,
                               preferred_element_type=jnp.complex64)) \
        * jnp.complex64(1.0 / n)
