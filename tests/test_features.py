"""LP-cone structure detectors (ref hdsdp_conic_lp.c:540-667).

The reference's LPConeGetStatsImpl feeds INT_FEATURE_I_IMPYBOUND /
INT_FEATURE_I_NODINTERIOR into HDSDPIAdjustConeParams; these tests pin
the detector semantics and that the tuning branches actually fire.
"""

import numpy as np

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.solver.params import Params, adjust_params


def _prob(lp_A, lp_c):
    m = lp_A.shape[0]
    n = 4
    rng = np.random.default_rng(0)
    C = -np.eye(n)
    A = np.zeros((m, n, n))
    for i in range(m):
        A[i, i % n, i % n] = 1.0
    return SDPProblem.from_dense_blocks([C], [A], np.ones(m), lp_A=lp_A, lp_c=lp_c)


def test_implied_y_bound_detected():
    # each row: one +1 and one -1 entry -> y_i <= c_up[i], y_i >= -c_low[i]
    m, nlp = 3, 100
    A = np.zeros((m, nlp))
    c = np.zeros(nlp)
    ups = [7.0, 3.0, 5.0]
    lows = [-2.0, -9.0, -4.0]
    for i in range(m):
        A[i, i] = 1.0
        c[i] = ups[i]  # y_i <= c/a = ups[i]
        A[i, m + i] = -1.0
        c[m + i] = -lows[i]  # y_i >= c/a = lows[i]
    p = _prob(A, c)
    f = p.features
    assert f.imp_y_bound
    assert f.imp_y_up == 7.0
    assert f.imp_y_low == -9.0
    pars = adjust_params(Params(), f)
    assert pars.dual_box_up == 7.0
    assert pars.dual_box_low == -9.0
    assert "dual-bounded" in pars.model_notes


def test_implied_y_bound_rejected_on_wide_row():
    m, nlp = 2, 100
    A = np.zeros((m, nlp))
    A[0, :3] = 1.0  # 3 nonzeros in one row -> not an implied box
    A[1, 4] = 1.0
    c = np.ones(nlp)
    assert not _prob(A, c).features.imp_y_bound


def test_implied_y_bound_skipped_below_100_cols():
    m, nlp = 2, 98
    A = np.zeros((m, nlp))
    A[0, 0] = 1.0
    A[1, 1] = 1.0
    assert not _prob(A, np.ones(nlp)).features.imp_y_bound


def test_no_dual_interior_detected():
    # (x+, x-) split: objective and every row cancel pairwise
    m, nlp, half = 3, 100, 50
    A = np.zeros((m, nlp))
    c = np.zeros(nlp)
    c[:half] = np.arange(half, dtype=float)
    c[half:] = -c[:half]
    for i in range(m):
        A[i, i] = 2.0 + i
        A[i, half + i] = -(2.0 + i)
    f = _prob(A, c).features
    assert f.no_dual_interior
    pars = adjust_params(Params(), f)
    assert "no-dual interior" in pars.model_notes


def test_no_dual_interior_rejected_on_obj_mismatch():
    m, nlp, half = 2, 100, 50
    A = np.zeros((m, nlp))
    c = np.zeros(nlp)
    c[0], c[half] = 1.0, -0.5  # pair does not cancel
    A[0, 0], A[0, half] = 1.0, -1.0
    A[1, 1], A[1, half + 1] = 1.0, -1.0
    assert not _prob(A, c).features.no_dual_interior
