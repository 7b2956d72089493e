"""Accuracy tests for the sliced-bf16 high-precision matmul (ops.hpmm).

Oracle: numpy float128 (x86 80-bit extended, 64-bit mantissa) matmul.
Target: ~2^-45 relative error — the double-single (ops.dd) level that
backs the f64-parity factorizations (ref linalg/hdsdp_linsolver.c)."""

import numpy as np
import pytest

from hdsdp_tpu.ops import dd, hpmm


def _ref_matmul(a, b):
    return np.asarray(
        np.asarray(a, np.float128) @ np.asarray(b, np.float128)
    )


def _relerr(c, ref):
    ref = np.asarray(ref, np.float128)
    scale = np.max(np.abs(ref)) + 1e-300
    return float(np.max(np.abs(np.asarray(c, np.float128) - ref)) / scale)


@pytest.mark.parametrize("m,k,n", [(64, 64, 64), (96, 300, 80), (32, 1024, 48)])
def test_hpmm_random(m, k, n):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(m, k))
    b = rng.normal(size=(k, n))
    err = _relerr(hpmm.hpmm(a, b), _ref_matmul(a, b))
    assert err < 1e-12, err


def test_hpmm_beats_f64():
    """On an ill-conditioned product hpmm should be at least as accurate
    as straight f64 (it keeps ~48 bits but with exact accumulation)."""
    rng = np.random.default_rng(1)
    k = 2048
    a = rng.normal(size=(48, k))
    b = rng.normal(size=(k, 48))
    ref = _ref_matmul(a, b)
    err_hp = _relerr(hpmm.hpmm(a, b), ref)
    assert err_hp < 1e-12, err_hp


def test_hpmm_wild_scales():
    """Rows/cols spanning many orders of magnitude: the per-row/col
    power-of-two normalization must keep the error relative."""
    rng = np.random.default_rng(2)
    m = k = n = 96
    a = rng.normal(size=(m, k)) * np.logspace(-30, 30, m)[:, None]
    b = rng.normal(size=(k, n)) * np.logspace(25, -25, n)[None, :]
    err = _relerr(hpmm.hpmm(a, b), _ref_matmul(a, b))
    assert err < 1e-12, err


def test_hpmm_syrk():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(80, 513))  # odd K exercises chunk padding
    c = hpmm.hpmm_syrk(a)
    err = _relerr(c, _ref_matmul(a, a.T))
    assert err < 1e-12, err
    # not bitwise symmetric (pair folds happen in (t,u) order, which
    # differs between C[i,j] and C[j,i]) but must agree to DD level
    cn = np.asarray(c)
    np.testing.assert_allclose(cn, cn.T, rtol=1e-13, atol=1e-13 * np.abs(cn).max())


def test_hpmm_dd_interface():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(40, 200))
    b = rng.normal(size=(200, 40))
    import jax.numpy as jnp

    ah, al = dd.from_f64(jnp.asarray(a))
    bh, bl = dd.from_f64(jnp.asarray(b))
    ch, cl = hpmm.hpmm_dd(ah, al, bh, bl)
    c = np.asarray(dd.to_f64(ch, cl))
    err = _relerr(c, _ref_matmul(a, b))
    # DD in/out truncates operands to 48 bits first
    assert err < 5e-12, err


def test_hpmm_nan_propagates():
    """A NaN anywhere must poison the product row/col (PSD-check
    predicate semantics, ref hdsdp_linsolver.c:1112-1144)."""
    a = np.ones((8, 8))
    a[3, 4] = np.nan
    c = np.asarray(hpmm.hpmm(a, np.ones((8, 8))))
    assert np.isnan(c[3]).all()
    assert np.isfinite(c[0]).all()


def test_hpmm_presliced_matches_hpmm():
    """Pre-slicing the left operand (reused across refinement sweeps)
    must reproduce hpmm() exactly for the same inputs."""
    rng = np.random.default_rng(5)
    a = rng.normal(size=(96, 200)) * np.exp(rng.normal(size=(96, 1)) * 3)
    b = rng.normal(size=(200, 7))
    a_sl, ea = hpmm.hpmm_slice_a(a)
    c_pre = np.asarray(hpmm.hpmm_presliced(a_sl, ea, b))
    err = _relerr(c_pre, _ref_matmul(a, b))
    assert err < 1e-12, err
    np.testing.assert_array_equal(c_pre, np.asarray(hpmm.hpmm(a, b)))
