"""Marked-slow large-m regression lane (HDSDP_SLOW=1).

Gates the machinery that only engages at scale — AdaptiveCG with the
stale f32 preconditioner (ref ADPCG refresh policy), the regularization
ladder, the PSDP stall exit — which the default suite (m <= ~900)
never reaches.  Run each round via benchmarks/run_slow_lane.sh; the
output is recorded in NOTES.md so a regression is visible, not manual.
"""

import os

import numpy as np
import pytest

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import theta_sdpa
from hdsdp_tpu.solver.solver import HDSDPSolver

slow = pytest.mark.skipif(
    not os.environ.get("HDSDP_SLOW"),
    reason="large-m regression lane: set HDSDP_SLOW=1 "
    "(runs each round via benchmarks/run_slow_lane.sh)",
)


@slow
def test_large_m_adaptive_cg_path():
    """thetaG51-class structure at reduced n (m = 4201 >= 4096): the
    host loop must route the Schur solves through AdaptiveCG (auto
    kkt_solver crossover at kkt_cg_threshold), reuse stale f32
    preconditioners across iterations, and still reach the optimum."""
    data = theta_sdpa(n=150, n_edges=4200, seed=2)
    prob = SDPProblem.from_sdpa(data)
    assert prob.m >= 4096

    solver = HDSDPSolver(prob, verbose=False, fused=False)
    r = solver.optimize()
    assert r.status == "PRIMAL_DUAL_OPTIMAL"
    assert np.max(np.abs(r.dimacs)) < 1e-4

    # the CG path must actually have been taken, with factor reuse:
    # strictly fewer preconditioner factorizations than solves (the
    # live _cg object is released by release_solve_buffers; its stats
    # are preserved on the result)
    assert r.stats.get("cg_n_factor", 0) >= 1, (
        "AdaptiveCG never engaged at m >= 4096"
    )
    assert r.stats["cg_n_factor"] < r.stats["cg_n_solve"]


@slow
def test_flagship_shape_mesh_dryrun():
    """VERDICT r4 #8: the BASELINE 'host -> pod at m >= 10k' claim gets
    correctness-shape evidence — one torus-22-sized (m = n = 10648)
    row-sharded KKT build + distributed blocked Cholesky + 3 KKT solves
    on the 8-virtual-device CPU mesh, asserting that no device ever
    holds all of M (the whole point of the row sharding)."""
    import __graft_entry__ as ge

    os.environ["HDSDP_DRYRUN_FLAGSHIP"] = "1"
    try:
        import jax

        ge.dryrun_multichip(len(jax.devices()))
    finally:
        del os.environ["HDSDP_DRYRUN_FLAGSHIP"]
