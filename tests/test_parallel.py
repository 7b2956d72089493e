"""Multi-chip path: sharded Schur assembly must match the single-chip
assembly elementwise on an 8-virtual-device CPU mesh, and a sharded
end-to-end solve must reach the same optimum."""

import jax.numpy as jnp
import numpy as np
import pytest

from hdsdp_tpu.io.sdpa import read_sdpa
from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import random_sdpa
from hdsdp_tpu.parallel import ShardedConeSystem, make_mesh
from hdsdp_tpu.solver.cones import ConeSystem
from hdsdp_tpu.solver.solver import HDSDPSolver


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.mark.parametrize("fname", ["theta1.dat-s", "truss1.dat-s"])
def test_sharded_kkt_matches_single(examples_dir, mesh, fname):
    data = read_sdpa(f"{examples_dir}/{fname}")
    prob = SDPProblem.from_sdpa(data)
    ref = ConeSystem(prob)
    sh = ShardedConeSystem(prob, mesh)

    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.normal(size=prob.m) * 0.01)
    shift = 10.0 + prob.features.obj_fro_norm

    S1, s1 = ref.assemble(1.0, -1.0, y, shift)
    S2, s2 = sh.assemble(1.0, -1.0, y, shift)
    for a, b in zip(S1, S2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    if s1 is not None:
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-12)

    ok1, L1 = ref.factor(S1, s1)
    ok2, L2 = sh.factor(S2, s2)
    assert bool(ok1) and bool(ok2)

    for kind in ("hsd", "inf", "corr"):
        k1 = ref.build_kkt(L1, s1, -1.3, kind)
        k2 = sh.build_kkt(L2, s2, -1.3, kind)
        if kind != "corr":
            scale = max(1.0, float(jnp.max(jnp.abs(k1.M))))
            np.testing.assert_allclose(
                np.asarray(k2.M), np.asarray(k1.M), atol=1e-9 * scale
            )
        np.testing.assert_allclose(
            np.asarray(k2.asinv), np.asarray(k1.asinv), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(k2.asinvrdsinv), np.asarray(k1.asinvrdsinv), atol=1e-9
        )
        assert float(k2.trace_sinv) == pytest.approx(float(k1.trace_sinv), rel=1e-10)
        if kind == "hsd":
            np.testing.assert_allclose(
                np.asarray(k2.asinvcsinv), np.asarray(k1.asinvcsinv), atol=1e-9
            )
            for f in ("csinv", "csinvcsinv", "csinvrdsinv"):
                assert float(getattr(k2, f)) == pytest.approx(
                    float(getattr(k1, f)), rel=1e-9, abs=1e-12
                )


def test_sharded_end_to_end(mesh):
    data = random_sdpa(m=20, block_dims=[10, 6], n_lp=4, seed=5)
    prob = SDPProblem.from_sdpa(data)
    r_ref = HDSDPSolver(prob, verbose=False).optimize()
    r_sh = HDSDPSolver(prob, mesh=mesh, verbose=False).optimize()
    assert r_sh.status == "PRIMAL_DUAL_OPTIMAL"
    assert r_sh.d_obj == pytest.approx(r_ref.d_obj, rel=1e-6)


def test_graft_entry_and_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    import jax

    fn, args = ge.entry()
    dy, ok = jax.jit(fn)(*args)
    assert bool(ok)
    assert bool(jnp.all(jnp.isfinite(dy)))
    ge.dryrun_multichip(8)
