"""PCG Schur backend: single-chip AdaptiveCG policy, row-sharded CG on the
virtual mesh, and an end-to-end solve driven through the CG path."""

import jax.numpy as jnp
import numpy as np
import pytest

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import random_sdpa
from hdsdp_tpu.ops.cg import STATUS_OK, AdaptiveCG, pcg
from hdsdp_tpu.parallel import make_mesh
from hdsdp_tpu.parallel.cg import sharded_pcg
from hdsdp_tpu.solver.solver import HDSDPSolver


def _spd(m, seed=0, cond=1e3):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    w = np.geomspace(1.0, cond, m)
    return jnp.asarray(Q @ np.diag(w) @ Q.T)


def test_pcg_jacobi_converges():
    m = 60
    M = _spd(m, seed=1, cond=50.0)
    rhs = jnp.asarray(np.random.default_rng(2).normal(size=m))
    res = pcg(M, rhs, jnp.diag(M), max_iter=200)
    assert int(res.status) == STATUS_OK
    x_ref = np.linalg.solve(np.asarray(M), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-5)


def test_adaptive_cg_escalates_on_illconditioned():
    m = 80
    M = _spd(m, seed=3, cond=1e10)
    rhs = jnp.asarray(np.random.default_rng(4).normal(size=m))
    cg = AdaptiveCG()
    x = cg.solve(M, rhs)
    x_ref = np.linalg.solve(np.asarray(M), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-5, atol=1e-6)
    assert cg.n_factor >= 1  # f32 tier stalled -> f64 preconditioner
    # second solve with a nearby matrix reuses the stale factor
    nf = cg.n_factor
    x2 = cg.solve(M + 1e-6 * jnp.eye(m), rhs)
    np.testing.assert_allclose(np.asarray(x2), x_ref, rtol=1e-4, atol=1e-5)
    assert cg.n_factor == nf


def test_adaptive_cg_dd_full_tier(monkeypatch):
    """The TPU full-precision tier (DD blocked MXU factor + DD-solve
    refinement, round 5) must deliver the same escalation semantics as
    the f64 tier it replaces: kappa ~ 1e10 solves to direct-solve
    accuracy, factor_dd recorded in the ledger, stale reuse intact."""
    from hdsdp_tpu.ops import cg as cg_mod

    monkeypatch.setattr(cg_mod, "use_dd_full_tier", lambda m: True)
    m = 80
    M = _spd(m, seed=3, cond=1e10)
    rhs = jnp.asarray(np.random.default_rng(4).normal(size=(m, 2)))
    cg = cg_mod.AdaptiveCG()
    X, ok = cg.solve_mat_checked(M, rhs)
    assert ok
    X_ref = np.linalg.solve(np.asarray(M), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-5, atol=1e-6)
    kinds = [k for k, _, _ in cg.history]
    assert "factor_dd" in kinds, kinds
    # second solve with a nearby matrix reuses the stale DD factor
    nf = cg.n_factor
    X2, ok2 = cg.solve_mat_checked(M + 1e-6 * jnp.eye(m), rhs)
    assert ok2 and cg.n_factor == nf


def test_sharded_pcg_matches_direct():
    mesh = make_mesh(8)
    m = 100  # not a multiple of 8: exercises padding
    M = _spd(m, seed=5, cond=100.0)
    rhs = jnp.asarray(np.random.default_rng(6).normal(size=m))
    x, iters = sharded_pcg(mesh, M, rhs, max_iter=400)
    x_ref = np.linalg.solve(np.asarray(M), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-5)


def test_solver_via_cg_backend():
    prob = SDPProblem.from_sdpa(random_sdpa(m=20, block_dims=[10], seed=8))
    r_cg = HDSDPSolver(prob, verbose=False, fused=False, kkt_solver="cg").optimize()
    r_di = HDSDPSolver(prob, verbose=False, fused=False, kkt_solver="direct").optimize()
    assert r_cg.status == "PRIMAL_DUAL_OPTIMAL"
    assert r_cg.d_obj == pytest.approx(r_di.d_obj, rel=1e-6)


def test_cg_reports_failure_on_indefinite():
    """An indefinite M must be reported (ok=False), not silently NaN."""
    m = 40
    M = _spd(m, seed=9)
    M = M - 10.0 * jnp.eye(m)  # make indefinite
    rhs = jnp.asarray(np.random.default_rng(10).normal(size=m))
    cg = AdaptiveCG()
    x, ok = cg.solve_checked(M, rhs)
    assert not ok


def test_solver_cg_escalates_direct():
    """DualIPM.solve_kkt must escalate to the direct ladder when CG fails
    (ADVICE: CG backend previously iterated on NaNs)."""
    from hdsdp_tpu.solver.algo import DualIPM
    from hdsdp_tpu.solver.params import Params

    # m must exceed CG's max_iter cap, else the Krylov method terminates
    # exactly on the indefinite system within m iterations
    prob = SDPProblem.from_sdpa(random_sdpa(m=120, block_dims=[10], seed=8))
    ipm = DualIPM(prob, Params(verbose=False, kkt_solver="cg"))
    m = ipm.m
    rng = np.random.default_rng(11)
    Q = np.asarray(rng.normal(size=(m, m)))
    # genuinely indefinite: mixed-sign spectrum (not merely negative definite)
    M_bad = jnp.asarray(0.05 * (Q + Q.T) + np.diag(np.linspace(-1.0, 1.0, m)))
    from hdsdp_tpu.solver.cones import KKTOut

    ipm.kkt = KKTOut(M=M_bad, asinv=None, asinvrdsinv=None, asinvcsinv=None,
                     csinv=None, csinvcsinv=None, csinvrdsinv=None,
                     trace_sinv=None)
    ipm.factor_kkt()
    rhs = jnp.asarray(rng.normal(size=m))
    x = ipm.solve_kkt(rhs)
    # the LU fallback must produce the true solution of the indefinite system
    x_ref = np.linalg.solve(np.asarray(M_bad), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-8)
    assert ipm.Mfac[0] in ("lu", "chol")


def test_refine_solve_pre_inverted_matches_triangular():
    """The inverted-preconditioner apply (blocked panel inversion + two
    matmuls — the TPU path that avoids the [k, m, m] triangular-solve
    expander temp) must reach the same f64 accuracy as the triangular
    apply on the same equilibrated f32 factor."""
    from hdsdp_tpu.ops.cg import _equilibrated_factor, refine_solve
    from hdsdp_tpu.ops.chol import blocked_tri_inverse

    m, k = 600, 8
    M = _spd(m, seed=9, cond=1e6)
    rng = np.random.default_rng(10)
    B = jnp.asarray(rng.normal(size=(m, k)))

    L, s, ok = _equilibrated_factor(M, f32=True)
    assert bool(ok)
    X_tri, st_tri, _ = refine_solve(M, L, s, B)
    Linv = blocked_tri_inverse(L, block=128)
    X_inv, st_inv, _ = refine_solve(M, Linv, s, B, pre_inverted=True)

    assert int(st_tri) == STATUS_OK and int(st_inv) == STATUS_OK
    X_ref = np.linalg.solve(np.asarray(M), np.asarray(B))
    scale = np.max(np.abs(X_ref))
    np.testing.assert_allclose(np.asarray(X_tri) / scale,
                               X_ref / scale, atol=1e-9)
    np.testing.assert_allclose(np.asarray(X_inv) / scale,
                               X_ref / scale, atol=1e-9)


def test_refine_solve_hp_residual_matches_direct():
    """hp_residual=True evaluates R = B - M X through the Ozaki-sliced
    MXU matmul (the large-m TPU path that avoids XLA's [8, m, m] f64
    dot-emulation temp — the torus-22 OOM) and must still converge to a
    direct-solve-accurate X under its ~2^-45 acceptance floor."""
    from hdsdp_tpu.ops.cg import STATUS_OK, _equilibrated_factor, refine_solve

    m, k = 384, 5
    M = _spd(m, seed=12, cond=1e6)
    rng = np.random.default_rng(13)
    B = jnp.asarray(rng.normal(size=(m, k)))

    L, s, ok = _equilibrated_factor(M, f32=True)
    assert bool(ok)
    X, st, _ = refine_solve(M, L, s, B, hp_residual=True)
    assert int(st) == STATUS_OK
    X_ref = np.linalg.solve(np.asarray(M), np.asarray(B))
    scale = np.max(np.abs(X_ref))
    # forward-error floor is kappa * 2^-45 ~ 3e-8 at cond=1e6 (the f64
    # path's floor is kappa * n * eps64 — same order at this size)
    np.testing.assert_allclose(np.asarray(X) / scale, X_ref / scale,
                               atol=1e-7)


def test_check_time_dd_solve_matches_f64_ladder(monkeypatch):
    """The check-time DD fast path (dimacs._dd_solve_checked, round 5)
    must agree with the f64 regularization ladder it short-circuits: the
    refinement runs against the ORIGINAL f64 M, so the dy it returns is
    direct-solve exact even though the factor backend is the ~2^-45 DD
    blocked MXU factor (ref check semantics: hdsdp.c:771-933 computes
    DIMACS from an exact dy)."""
    from hdsdp_tpu.ops import cg as cg_mod
    from hdsdp_tpu.solver import dimacs as dm

    monkeypatch.setattr(cg_mod, "use_dd_full_tier", lambda m: True)
    m = 96
    M = _spd(m, seed=21, cond=1e9)
    rhs = jnp.asarray(np.random.default_rng(22).normal(size=m))
    dy = dm._dd_solve_checked(M, rhs)
    assert dy is not None
    ok, dy_ref = dm._chol_solve_ladder(M, rhs)
    assert bool(ok)
    scale = float(jnp.max(jnp.abs(dy_ref)))
    np.testing.assert_allclose(np.asarray(dy) / scale,
                               np.asarray(dy_ref) / scale, atol=1e-9)


def test_check_time_dd_solve_falls_back_on_indefinite(monkeypatch):
    """A near-indefinite check-time system must not be silently solved
    by the DD fast path: the factor fails, _dd_solve_checked returns
    None, and the caller's f64 regularization ladder takes over."""
    from hdsdp_tpu.ops import cg as cg_mod
    from hdsdp_tpu.solver import dimacs as dm

    monkeypatch.setattr(cg_mod, "use_dd_full_tier", lambda m: True)
    m = 64
    M = _spd(m, seed=31) - 5.0 * jnp.eye(m)  # indefinite
    rhs = jnp.asarray(np.random.default_rng(32).normal(size=m))
    assert dm._dd_solve_checked(M, rhs) is None
