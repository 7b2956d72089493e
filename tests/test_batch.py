"""Batched multi-instance solving (solver.batch): per-instance results
must match solo solves — jax's while-loop batching freezes finished
instances, so trajectories are the solo trajectories."""

import numpy as np
import pytest

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import maxcut_sdpa, random_sdpa
from hdsdp_tpu.solver.batch import solve_batch
from hdsdp_tpu.solver.solver import HDSDPSolver


def test_batch_matches_solo():
    probs = [
        SDPProblem.from_sdpa(random_sdpa(m=16, block_dims=[8], n_lp=0, seed=s))
        for s in (21, 22, 23)
    ]
    rb = solve_batch(probs)
    assert len(rb) == 3
    for prob, r in zip(probs, rb):
        rs = HDSDPSolver(prob, verbose=False).optimize()
        assert r.status == rs.status == "PRIMAL_DUAL_OPTIMAL"
        assert r.d_obj == pytest.approx(rs.d_obj, rel=1e-7)
        assert np.max(np.abs(r.dimacs)) < 1e-2


def test_batch_maxcut_family():
    """Same-size maxcut ensemble (different graphs): the realistic batch
    workload.  Iteration counts may differ per instance; every one must
    still reach its own optimum."""
    probs = [
        SDPProblem.from_sdpa(maxcut_sdpa(n=40, seed=s)) for s in range(4)
    ]
    rb = solve_batch(probs)
    objs = set()
    for prob, r in zip(probs, rb):
        assert r.status == "PRIMAL_DUAL_OPTIMAL"
        assert np.max(np.abs(r.dimacs)) < 1e-2
        objs.add(round(r.d_obj, 6))
    assert len(objs) == 4  # genuinely different instances


def test_batch_rejects_mixed_shapes():
    probs = [
        SDPProblem.from_sdpa(random_sdpa(m=16, block_dims=[8], seed=1)),
        SDPProblem.from_sdpa(random_sdpa(m=20, block_dims=[8], seed=2)),
    ]
    with pytest.raises(ValueError):
        solve_batch(probs)
