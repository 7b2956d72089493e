"""Standalone LP IPM: golden objectives on the bundled MPS fixtures
(netlib optima; ref tests/test_file_io.c:89-183 is the equivalent driver)
plus a synthetic random LP sanity check."""

import os

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


def test_lp_golden_10teams(examples_dir):
    """Larger golden fixture (nrow=1800): measured factor:solve switch-over
    machinery runs, optimum matches netlib (ref tests/test_file_io.c:89-183)."""
    r = solve_mps_file(f"{examples_dir}/10teams.mps", verbose=False)
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    assert r.p_obj == pytest.approx(897.0, rel=1e-5)
    assert r.d_obj == pytest.approx(897.0, rel=1e-5)


@pytest.mark.skipif(
    not os.environ.get("HDSDP_SLOW"),
    reason="acc-tight4 (nrow=4905) needs ~3 min of CPU Cholesky; "
    "set HDSDP_SLOW=1 (verified: OPTIMAL, obj 1.4e-13)",
)
def test_lp_golden_acc_tight4(examples_dir):
    """Degenerate fixture with redundant equality rows: exercises the
    persistent regularization-ladder rung (ref qdldl static regularization)."""
    r = solve_mps_file(f"{examples_dir}/acc-tight4.mps", verbose=False)
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    assert abs(r.p_obj) < 1e-5
    assert abs(r.d_obj) < 1e-5


def test_lp_primal_phase_runs():
    """Force the primal-only switch-over (primal_switch_ratio=0) and check
    the flagship primal phase (ref HLpSolverITakePrimalStep,
    hdsdp_lpsolve.c:949-1092) is actually entered and still reaches the
    optimum."""
    rng = np.random.default_rng(7)
    m, n = 40, 100
    A = rng.normal(size=(m, n))
    x0 = rng.random(n) + 0.5
    b = A @ x0
    c = A.T @ rng.normal(size=m) + rng.random(n) + 0.5
    solver = LPSolver(
        A, b, c, LPParams(verbose=False, primal_switch_ratio=0.0)
    )
    r = solver.optimize()
    assert solver.last_method == "primal"
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    assert r.p_obj == pytest.approx(r.d_obj, rel=1e-6)


RANGED_MPS = """NAME          RANGED
ROWS
 N  COST
 L  R1
 G  R2
 E  R3
COLUMNS
    X1        COST      -1.0   R1   1.0
    X1        R2         1.0   R3   1.0
    X2        COST      -2.0   R1   1.0
    X2        R2        -1.0   R3   2.0
RHS
    RHS       R1         4.0   R2  -1.0
    RHS       R3         3.0
RANGES
    RNG       R1         2.0   R2   3.0
    RNG       R3         {r3}
ENDATA
"""


@pytest.mark.parametrize(
    "r3,obj",
    [
        (4.0, -6.5),  # E range > 0:  3 <= x1+2x2 <= 7
        (-4.0, -3.0),  # E range < 0: -1 <= x1+2x2 <= 3
    ],
)
def test_lp_ranges_full_semantics(tmp_path, r3, obj):
    """Two-sided rows via RANGES incl. signed E-row ranges
    (ref external/lp_mps.c semantics; hand-computed optima)."""
    path = tmp_path / "ranged.mps"
    path.write_text(RANGED_MPS.format(r3=r3))
    r = solve_mps_file(str(path), verbose=False)
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    assert r.p_obj == pytest.approx(obj, rel=1e-6)
