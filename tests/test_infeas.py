"""Infeasibility / unboundedness detection: dual improving ray (Phase B)
and the homogeneous self-dual embedding (Phase A'), fused and host paths."""

import numpy as np
import pytest

from hdsdp_tpu.io.sdpa import BlockEntries, SDPAData
from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.solver.solver import HDSDPSolver


def _primal_infeasible():
    """tr(X) = -1 with X >= 0: dual unbounded (improving ray exists)."""
    n = 4
    rows = np.arange(n, dtype=np.int32)
    con = np.concatenate([np.zeros(n, np.int32), np.ones(n, np.int32)])
    r = np.concatenate([rows, rows])
    data = SDPAData(
        m=1, block_dims=[n], b=np.array([-1.0]),
        blocks=[BlockEntries(dim=n, con=con, row=r, col=r.copy(),
                             val=np.ones(2 * n))],
        nnz=2 * n,
    )
    return SDPProblem.from_sdpa(data)


def _dual_infeasible():
    """C=[[0,1],[1,0]], A1=diag(1,0): det(C - y A1) = -1 for all y, so the
    dual has no interior point; the HSD method must engage."""
    data = SDPAData(
        m=1, block_dims=[2], b=np.array([1.0]),
        blocks=[BlockEntries(
            dim=2,
            con=np.array([0, 1], np.int32),
            row=np.array([1, 0], np.int32),
            col=np.array([0, 0], np.int32),
            val=np.array([1.0, 1.0]),
        )],
        nnz=2,
    )
    return SDPProblem.from_sdpa(data)


@pytest.mark.parametrize("fused", [True, False])
def test_dual_ray_detection(fused):
    r = HDSDPSolver(_primal_infeasible(), verbose=False, fused=fused).optimize()
    assert r.status in ("INFEAS_OR_UNBOUNDED", "SUSPECT_INFEAS_OR_UNBOUNDED")


@pytest.mark.parametrize("fused", [True, False])
def test_hsd_engages_on_dual_infeasible(fused):
    r = HDSDPSolver(_dual_infeasible(), verbose=False, fused=fused).optimize()
    assert r.status in ("INFEAS_OR_UNBOUNDED", "SUSPECT_INFEAS_OR_UNBOUNDED")
