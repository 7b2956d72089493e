"""Programmatic construction + solution extraction API parity
(ref HUserDataSetConeData / HDSDPGetRowDual / HDSDPGetConeValues)."""

import numpy as np
import pytest

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.solver.solver import HDSDPSolver


def test_from_dense_blocks_and_extraction():
    rng = np.random.default_rng(0)
    m, n = 12, 6
    A = np.zeros((m, n, n))
    for i in range(m):
        B = rng.normal(size=(n, n))
        A[i] = 0.5 * (B + B.T)
    X0 = np.eye(n) + 0.1 * np.ones((n, n))
    b = np.einsum("ipq,pq->i", A, X0)
    y0 = rng.normal(size=m) * 0.1
    G = rng.normal(size=(n, n)) / np.sqrt(n)
    C = G @ G.T + 0.5 * np.eye(n) + np.einsum("i,ipq->pq", y0, A)

    prob = SDPProblem.from_dense_blocks([C], [A], b)
    solver = HDSDPSolver(prob, verbose=False)
    r = solver.optimize()
    assert r.status == "PRIMAL_DUAL_OPTIMAL"

    y = solver.get_row_dual()
    assert y.shape == (m,)
    Xs, x_lp = solver.get_primal()
    assert x_lp is None and len(Xs) == 1
    X = Xs[0]
    # primal feasibility + PSD-ness of the recovered X
    assert np.linalg.norm(np.einsum("ipq,pq->i", A, X) - b) < 1e-4 * (
        1 + np.linalg.norm(b)
    )
    assert np.linalg.eigvalsh(X).min() > -1e-6

    Ss, s_lp = solver.get_dual_slacks()
    assert np.linalg.eigvalsh(Ss[0]).min() > -1e-10
    # strong duality: <C,X> ~ b'y
    assert np.sum(C * X) == pytest.approx(float(b @ y), rel=1e-4)


def test_kkt_cross_validate_utility():
    from hdsdp_tpu.models.synthetic import random_sdpa
    from hdsdp_tpu.utils.kktcheck import kkt_cross_validate

    prob = SDPProblem.from_sdpa(
        random_sdpa(m=14, block_dims=[6, 4], n_lp=3, seed=2)
    )
    errs = kkt_cross_validate(prob)
    assert max(errs.values()) < 1e-8
