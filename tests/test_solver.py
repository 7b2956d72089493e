"""End-to-end golden-objective tests on the bundled SDPA instances.

Golden values: the reference's own printed objectives (mcp100 from
doc/hdsdp_doc.tm:1595-1615; others are the SDPLIB optima under HDSDP's
sign convention) with its DIMACS acceptance gate of 1e-2
(ref interface/hdsdp.c:905-921).
"""

import numpy as np
import pytest

from hdsdp_tpu.solver.solver import solve_sdpa_file

GOLDEN = {
    # file: (objective, iter budget)
    "mcp100.dat-s": -226.15735,
    "theta1.dat-s": -23.0,
    "gpp100.dat-s": 44.94359,
    "truss1.dat-s": 8.999996,
}


@pytest.mark.parametrize("fname,obj", sorted(GOLDEN.items()))
def test_golden_solve(examples_dir, fname, obj):
    r = solve_sdpa_file(f"{examples_dir}/{fname}", verbose=False)
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    assert r.d_obj == pytest.approx(obj, rel=1e-4)
    assert r.p_obj == pytest.approx(obj, rel=1e-4)
    assert np.max(np.abs(r.dimacs)) < 1e-2
    assert r.n_iters < 100


def test_mcp100_matches_reference_closely(examples_dir):
    """The reference solves mcp100 in 34 iterations to gap 2.95e-06
    (doc/hdsdp_doc.tm:1560-1614); we should be in the same regime."""
    r = solve_sdpa_file(f"{examples_dir}/mcp100.dat-s", verbose=False)
    assert r.n_iters <= 50
    assert abs(r.gap) < 1e-4
    assert r.d_obj == pytest.approx(-226.15735148, rel=1e-7)


def test_batch_min_eval_fast_path_matches_exact():
    """The large-block min-eigenvalue fast path (f32 eigh + f64 Rayleigh
    refinement) must agree with exact f64 eigh far below the DIMACS gate,
    including indefinite and near-singular spectra."""
    import jax.numpy as jnp

    from hdsdp_tpu.solver import dimacs

    n = dimacs._EXACT_EIG_DIM + 16  # forces the fast path
    rng = np.random.default_rng(11)
    for spec in (
        np.linspace(1e-9, 5.0, n),          # PSD, clustered bottom
        np.linspace(-3e-3, 4.0, n),         # indefinite at gate scale
        np.r_[np.full(8, 1e-7), np.linspace(0.5, 2.0, n - 8)],  # bottom cluster
    ):
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        X = jnp.asarray((Q * spec) @ Q.T, jnp.float64)[None]
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        fast = float(dimacs._batch_min_eval(X))
        exact = float(jnp.min(jnp.linalg.eigvalsh(X)))
        assert fast == pytest.approx(exact, abs=1e-6 * max(1.0, abs(spec).max()))


def test_lanczos_min_eval_matches_exact():
    """The huge-block Lanczos min-eigenvalue estimate (no dense eig at
    any n — the n >= 8192 DIMACS path) must locate lambda_min well below
    the 1e-2 DIMACS acceptance gate on PSD, indefinite and clustered
    spectra."""
    import jax.numpy as jnp

    from hdsdp_tpu.solver import dimacs

    n = 1024
    rng = np.random.default_rng(5)
    for spec in (
        np.linspace(1e-9, 5.0, n),          # PSD, clustered bottom
        np.linspace(-3e-3, 4.0, n),         # indefinite at gate scale
        np.r_[np.full(8, -1e-5), np.linspace(0.5, 2.0, n - 8)],  # neg cluster
    ):
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        X = jnp.asarray((Q * spec) @ Q.T, jnp.float64)
        X = 0.5 * (X + X.T)
        est = float(dimacs._lanczos_min_one(X))
        exact = float(jnp.min(jnp.linalg.eigvalsh(X)))
        # resolves to ~1e-4 ||X|| on clustered bottoms; the value feeds
        # a 1e-2 acceptance gate, and the estimate never understates
        # negativity direction (Rayleigh quotient >= lambda_min)
        assert est >= exact - 1e-12
        assert est == pytest.approx(exact, abs=2e-4 * max(1.0, abs(spec).max()))


def test_certified_min_eval_brackets_violation():
    """The try-Cholesky certificate (ref hdsdp_linsolver.c:1112-1144 on
    X + dI) must return a LOWER bound on lambda_min that is within one
    ladder decade of the truth — including the adversarial near-PSD case
    where a tiny negative eigenvalue hides in a clustered bottom (the
    case an unconverged Lanczos sweep can miss entirely)."""
    import jax.numpy as jnp

    from hdsdp_tpu.solver import dimacs

    n = 512
    rng = np.random.default_rng(23)
    for lam_min in (1e-3, -1e-8, -1e-6, -1e-3):
        # adversarial: the negative direction sits inside a cluster of
        # near-zero eigenvalues of the same magnitude
        spec = np.r_[lam_min, np.full(16, abs(lam_min) * 2),
                     np.linspace(0.5, 2.0, n - 17)]
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        X = jnp.asarray((Q * spec) @ Q.T, jnp.float64)
        X = 0.5 * (X + X.T)
        # est deliberately optimistic (simulates a missed-negativity
        # Lanczos sweep): the certificate must still catch the violation
        got = dimacs._certified_block_min_eval(X, est=0.0)
        assert got <= lam_min + 1e-12  # never under-reports the violation
        if lam_min < 0:
            # over-report bounded by the decade ladder + rounding slack
            assert got >= 20.0 * lam_min - 1e-10
