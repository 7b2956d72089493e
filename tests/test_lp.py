"""Standalone LP IPM: golden objectives on the bundled MPS fixtures
(netlib optima; ref tests/test_file_io.c:89-183 is the equivalent driver)
plus a synthetic random LP sanity check."""

import numpy as np
import pytest

from hdsdp_tpu.solver.lpsolve import LPParams, LPSolver, solve_mps_file

GOLDEN = {
    "afiro.mps": -464.75314286,
    "blend.mps": -30.812149846,
}


@pytest.mark.parametrize("fname,obj", sorted(GOLDEN.items()))
def test_lp_golden(examples_dir, fname, obj):
    r = solve_mps_file(f"{examples_dir}/{fname}", verbose=False)
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    assert r.p_obj == pytest.approx(obj, rel=1e-6)
    assert r.d_obj == pytest.approx(obj, rel=1e-6)


def test_lp_random_feasible():
    rng = np.random.default_rng(0)
    m, n = 30, 80
    A = rng.normal(size=(m, n))
    x0 = rng.random(n) + 0.5
    b = A @ x0
    y0 = rng.normal(size=m)
    s0 = rng.random(n) + 0.5
    c = A.T @ y0 + s0
    r = LPSolver(A, b, c, LPParams(verbose=False)).optimize()
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    # strong duality
    assert r.p_obj == pytest.approx(r.d_obj, rel=1e-7)
    assert np.all(r.x > -1e-9)
    assert np.linalg.norm(A @ r.x - b) < 1e-6 * (1 + np.linalg.norm(b))


@pytest.mark.parametrize("scal", ["ruiz", "geometric", "l2", "none"])
def test_lp_scalings(scal):
    rng = np.random.default_rng(3)
    m, n = 10, 25
    A = rng.normal(size=(m, n)) * np.exp(rng.normal(size=(1, n)) * 2)
    x0 = rng.random(n) + 0.5
    b = A @ x0
    c = A.T @ rng.normal(size=m) + rng.random(n) + 0.5
    r = LPSolver(A, b, c, LPParams(verbose=False, scal_method=scal)).optimize()
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
