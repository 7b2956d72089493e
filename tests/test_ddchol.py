"""DD blocked Cholesky (ops.ddchol) vs f64 LAPACK oracle.

Gates the f64-parity claim: factor/solve/inverse/logdet must track numpy
f64 results at DD (~1e-13 * cond) level, and the PSD predicate must
match the reference's try-Cholesky semantics
(ref hdsdp_linsolver.c:1112-1144)."""

import numpy as np
import pytest

from hdsdp_tpu.ops import ddchol


def _spd(n, cond, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    d = np.logspace(0, -np.log10(cond), n)
    return (q * d) @ q.T


@pytest.mark.parametrize("n,block", [(64, 32), (130, 64), (300, 128)])
def test_factor_residual(n, block):
    a = _spd(n, 1e6, seed=n)
    f = ddchol.factor(a, block=block)
    assert bool(ddchol.ok(f))
    l = np.asarray(ddchol.chol_f64(a, block=block))
    assert np.allclose(l, np.tril(l))
    res = np.abs(l @ l.T - a).max() / np.abs(a).max()
    assert res < 1e-12, res


@pytest.mark.parametrize("cond", [1e2, 1e8, 1e12])
def test_solve_accuracy(cond):
    n = 200
    a = _spd(n, cond, seed=3)
    rng = np.random.default_rng(4)
    x_true = rng.normal(size=(n, 3))
    b = a @ x_true
    f = ddchol.factor(a, block=64)
    x = np.asarray(ddchol.solve(f, b))
    # forward-stable: relative error ~ cond * 2^-45
    err = np.abs(x - x_true).max() / np.abs(x_true).max()
    assert err < 3e-13 * cond + 1e-11, err
    # 1-D rhs path
    x1 = np.asarray(ddchol.solve(f, b[:, 0]))
    assert x1.shape == (n,)
    np.testing.assert_allclose(x1, x[:, 0], rtol=0, atol=1e-9)


def test_spd_inverse_and_logdet():
    n = 150
    a = _spd(n, 1e6, seed=7)
    f = ddchol.factor(a, block=64)
    inv = np.asarray(ddchol.spd_inverse(f, n))
    err = np.abs(inv @ a - np.eye(n)).max()
    assert err < 1e-7, err  # ~cond * 2^-45
    ld = float(ddchol.logdet(f, n))
    ref = np.linalg.slogdet(a)[1]
    assert abs(ld - ref) < 1e-9 * max(1.0, abs(ref))


def test_not_psd_gives_nan():
    a = _spd(40, 1e3, seed=9)
    a[5, 5] = -10.0  # make indefinite
    f = ddchol.factor(a, block=32)
    assert not bool(ddchol.ok(f))


def test_matches_f64_chol_well_conditioned():
    """On a benign matrix the DD factor and numpy's agree to ~1e-13."""
    n = 96
    a = _spd(n, 10.0, seed=11)
    l_dd = np.asarray(ddchol.chol_f64(a, block=32))
    l_np = np.linalg.cholesky(a)
    assert np.abs(l_dd - l_np).max() < 1e-13 * np.abs(l_np).max()


def test_dd_kkt_backend_golden_mcp100():
    """End-to-end: the DD Schur backend reproduces the mcp100 golden
    objective through the host loop (ref doc/hdsdp_doc.tm:1595-1615).

    kkt_fp="dd" forces ops.ddchol for every direct factorization; the
    run must match the f64 path's optimum to the DIMACS gate."""
    import numpy as np
    from hdsdp_tpu.solver.solver import solve_sdpa_file

    r = solve_sdpa_file(
        "/root/reference/examples/mcp100.dat-s",
        verbose=False,
        fused=False,
        kkt_fp="dd",
    )
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    assert r.d_obj == pytest.approx(-226.15735, rel=1e-4)
    assert np.max(np.abs(r.dimacs)) < 1e-2


def test_psd_factor_dd_dispatch_matches_xla():
    """ops.chol.psd_factor(use_dd=True) must match the XLA f64 factor on
    a single large block and agree on the PSD predicate for a non-PD
    input (the cone-side interior-check semantics)."""
    import jax.numpy as jnp
    import numpy as np
    from hdsdp_tpu.ops import chol as chol_ops

    rng = np.random.default_rng(3)
    n = 512
    G = rng.normal(size=(n, n))
    S = jnp.asarray(G @ G.T + n * np.eye(n))[None]

    ok_x, L_x = chol_ops.psd_check(S)
    ok_d, L_d = chol_ops.psd_factor(S, use_dd=True)
    assert bool(ok_x) and bool(ok_d)
    np.testing.assert_allclose(
        np.asarray(L_d), np.asarray(L_x), rtol=0, atol=1e-8 * n
    )

    S_bad = S - 2.0 * n * jnp.eye(n, dtype=S.dtype)[None]
    ok_d2, _ = chol_ops.psd_factor(S_bad, use_dd=True)
    ok_x2, _ = chol_ops.psd_check(S_bad)
    assert not bool(ok_d2)
    assert not bool(ok_x2)

    # small blocks / multi-block batches stay on the XLA path
    S_small = jnp.asarray(G[:64, :64] @ G[:64, :64].T + 64 * np.eye(64))[None]
    ok_s, L_s = chol_ops.psd_factor(S_small, use_dd=True)
    np.testing.assert_array_equal(
        np.asarray(L_s), np.asarray(chol_ops.psd_check(S_small)[1])
    )


def test_spd_inverse_from_f64_tri_matches_dpotri():
    """The DD blocked inverse built from an EXISTING f64 factor must
    match the f64 trisolve-on-identity inverse (~dpotri)."""
    import jax.numpy as jnp
    from hdsdp_tpu.ops import ddchol

    rng = np.random.default_rng(3)
    n = 600  # forces padding (not a block multiple)
    A = rng.standard_normal((n, n))
    A = jnp.asarray(A @ A.T + n * np.eye(n), jnp.float64)
    L = jnp.linalg.cholesky(A)
    U_dd = ddchol.spd_inverse_from_f64_tri(L)
    U_64 = jnp.linalg.inv(A)
    err = float(jnp.max(jnp.abs(U_dd - U_64)))
    assert err < 1e-11 * float(jnp.max(jnp.abs(U_64)))
