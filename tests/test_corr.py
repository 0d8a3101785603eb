"""ops/corr.py permuted MXU correlation vs the natural fft path.

The permuted Cooley-Tukey matmul path (the TPU tracking correlator) is
forced on the CPU backend with corr.FORCE_MATMUL and compared against
the jnp.fft natural-layout path and against the original
dsp.circ_correlate + dsp.peak_metrics chain it replaces.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gps_sdr_tpu.ops import corr, dsp


def _mk(n=256, k=3, c=2, seed=0, peaky=True):
    rng = np.random.default_rng(seed)
    code = np.sign(rng.standard_normal((c, n))).astype(np.float32)
    code_fft = np.fft.fft(code, axis=-1).astype(np.complex64)
    x = (rng.standard_normal((k, c, n)) * 0.3).astype(np.float32)
    xi = (rng.standard_normal((k, c, n)) * 0.3).astype(np.float32)
    if peaky:
        # embed a rolled code so there is a real correlation peak
        for ki in range(k):
            for ci in range(c):
                sh = (17 * ki + 41 * ci) % n
                x[ki, ci] += np.roll(code[ci], sh)
    return jnp.asarray(x), jnp.asarray(xi), jnp.asarray(code_fft)


def _run(xr, xi, code_fft, corr_min, force):
    old = corr.FORCE_MATMUL
    corr.FORCE_MATMUL = force
    try:
        spec = corr.prep_spec(code_fft, xr.shape[-1])
        return jax.tree.map(np.asarray,
                            corr.corr_peaks(xr, xi, spec, corr_min))
    finally:
        corr.FORCE_MATMUL = old


@pytest.mark.parametrize("peaky", [True, False])
def test_matmul_path_matches_fft_path(peaky):
    xr, xi, code_fft = _mk(peaky=peaky)
    d0, p0, n0 = _run(xr, xi, code_fft, 6.0, force=False)
    d1, p1, n1 = _run(xr, xi, code_fft, 6.0, force=True)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(n0, n1, rtol=1e-4)
    np.testing.assert_allclose(p0, p1, atol=1e-3)
    if peaky:
        assert (d0 >= 0).all()
    else:
        assert (d0 == -1).all()     # pure noise: below the 6-sigma gate


def test_matches_original_dsp_chain():
    xr, xi, code_fft = _mk(n=512, k=2, c=3, seed=7)
    x = jax.lax.complex(xr, xi)
    fft_mean = jnp.fft.fft(x, axis=-1).astype(jnp.complex64)
    c0 = dsp.circ_correlate(fft_mean, code_fft[None, :, :])
    ref = jax.vmap(jax.vmap(lambda cr: dsp.peak_metrics(cr, 6.0)))(c0)
    got = _run(xr, xi, code_fft, 6.0, force=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), got[0])
    np.testing.assert_allclose(np.asarray(ref[1]), got[1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ref[2]), got[2], rtol=1e-4)


def test_peak_on_every_lag_alignment():
    """The permuted argmax remap must hit the exact lag for every m."""
    n = 64
    rng = np.random.default_rng(3)
    code = np.sign(rng.standard_normal(n)).astype(np.float32)
    code_fft = jnp.asarray(np.fft.fft(code).astype(np.complex64))
    lags = np.arange(n)
    xr = jnp.asarray(np.stack([np.roll(code, m) for m in lags])
                     )[:, None, :]
    xi = jnp.zeros_like(xr)
    d, p, _ = _run(xr, xi, code_fft[None], 3.0, force=True)
    np.testing.assert_array_equal(d[:, 0], lags)
    np.testing.assert_allclose(p[:, 0], lags, atol=1e-2)
