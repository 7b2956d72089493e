"""Micro-benchmark the per-iteration primitives of the fused IPM.

Times, at a given (n, m), each device primitive that appears in one
Phase-B iteration (SURVEY.md section 3.3), so the s/iter number of the
end-to-end benchmarks can be decomposed and the next optimization
target chosen from data:

  - cone factor (DD blocked Cholesky of S, n x n)
  - S^-1 (DD inverse from the factor; feeds the diag/support buckets)
  - Schur factor at m (mixed-precision f32 + refinement, and DD)
  - 3-RHS Schur solve
  - Lanczos ratio test (30-dim Krylov with trisolve matvec)
  - diag-bucket Schur assembly (maxcut structure)

Usage: python benchmarks/prim_bench.py [n] [m]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    """Median wall time of a jitted call; checksum forces materialization."""
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out,
    )
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else n

    from hdsdp_tpu.ops import ddchol
    from hdsdp_tpu.ops import chol as chol_ops
    from hdsdp_tpu.ops.cg import refine_solve

    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n))
    S = jnp.asarray(A @ A.T + n * np.eye(n))
    Am = rng.standard_normal((m, m))
    M = jnp.asarray(Am @ Am.T + m * np.eye(m))
    rhs3 = jnp.asarray(rng.standard_normal((m, 3)))

    rows = []

    f = lambda x: ddchol.factor(x)
    rows.append(("dd_factor_S(n)", timeit(f, S)))
    fac = f(S)

    g = jax.jit(lambda fc: ddchol.spd_inverse(fc, n))
    rows.append(("dd_spd_inverse(n)", timeit(g, fac)))
    rows.append(("dd_solve_vec(n)", timeit(
        jax.jit(ddchol.solve), fac, jnp.asarray(np.ones(n)))))

    h64 = jax.jit(jnp.linalg.cholesky)
    rows.append(("xla_f64_chol_S(n)", timeit(h64, S)))
    h32 = jax.jit(lambda x: jnp.linalg.cholesky(x.astype(jnp.float32)))
    rows.append(("xla_f32_chol_S(n)", timeit(h32, S)))

    rows.append(("dd_factor_M(m)", timeit(lambda x: ddchol.factor(x), M)))
    rows.append(("xla_f32_chol_M(m)", timeit(h32, M)))
    from hdsdp_tpu.ops.cg import _equilibrated_factor
    L32, sc, okf = _equilibrated_factor(M)
    rows.append(("mp_f32_factor_M(m)", timeit(_equilibrated_factor, M)))
    rows.append(("mp_refine_solve_M(m,3rhs)", timeit(
        lambda M, r: refine_solve(M, L32, sc, r)[0], M, rhs3)))

    # triangular-solve latency (the Lanczos matvec building block)
    L = jnp.linalg.cholesky(S)
    v = jnp.asarray(rng.standard_normal((n,)))
    ts = jax.jit(lambda L, v: jax.scipy.linalg.solve_triangular(L, v, lower=True))
    rows.append(("f64_trisolve_vec(n)", timeit(ts, L, v)))
    L32, v32 = L.astype(jnp.float32), v.astype(jnp.float32)
    rows.append(("f32_trisolve_vec(n)", timeit(ts, L32, v32)))

    # one full Lanczos ratio test on a real cone system (maxcut structure)
    from hdsdp_tpu.models.problem import SDPProblem
    from hdsdp_tpu.models.synthetic import maxcut_sdpa
    from hdsdp_tpu.solver.cones import ConeSystem

    prob = SDPProblem.from_sdpa(maxcut_sdpa(n=n))
    cones = ConeSystem(prob)
    y = jnp.zeros((prob.m,), jnp.float64)
    rd0 = -float(prob.features.obj_fro_norm) - 10.0
    Sc, s_lp = cones.assemble(1.0, -1.0, y, -rd0)
    ok, Lc = cones.factor(Sc, s_lp)
    dy = jnp.asarray(rng.standard_normal((prob.m,)) * 1e-2)
    dS, ds_lp = cones.assemble(0.0, -1.0, dy, 0.0)
    rows.append(("cone_assemble_S", timeit(
        jax.jit(lambda y: cones.assemble(1.0, -1.0, y, -rd0)), y)))
    rows.append(("cone_factor_S", timeit(
        jax.jit(lambda S, s: cones.factor(S, s)), Sc, s_lp)))
    rt = jax.jit(lambda L, s, dS, ds: cones.ratio_test(L, s, dS, ds))
    try:
        rows.append(("cone_ratio_test", timeit(rt, Lc, s_lp, dS, ds_lp)))
    except Exception as e:
        rows.append((f"cone_ratio_test [skipped: {type(e).__name__}]", float("nan")))
    bk = jax.jit(lambda L, s: cones.build_kkt(L, s, rd0, "inf"))
    rows.append(("cone_build_kkt", timeit(bk, Lc, s_lp)))

    print(f"platform={jax.devices()[0].platform} n={n} m={m}")
    for name, t in rows:
        print(f"  {name:34s} {t*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
