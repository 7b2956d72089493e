"""Bandwidth roofline for the REAL hot path of maxG*/torus* solves.

The diag/support gather buckets are HBM-bound, not MXU-bound: a KKT
"inf" build at identity-diagonal structure moves ~5 m^2 doubles
(U^2 read/write, M write, column sums) and executes only O(m^2) flops.
This driver measures

  * HBM speed-of-light on this chip (big f32 copy, read+write GB/s),
  * the diag-bucket KKT build (maxG55 / torus22 sizes): wall, bytes
    moved (analytic), achieved GB/s, % of the measured ceiling,
  * the support-bucket build (theta12 size) the same way,

closing VERDICT r4 item #7 (go/no-go for a fused Pallas gather kernel).

    python benchmarks/bw_roofline.py [maxG55 torus22 theta12]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import maxcut_sdpa, theta_sdpa, torus_sdpa
from hdsdp_tpu.solver.cones import ConeSystem

REPS = 5


def hbm_ceiling() -> float:
    """Measured read+write GB/s of a big on-device f32 copy."""
    n = 8192
    x = jnp.ones((n, n), jnp.float32)

    @jax.jit
    def cp(a):
        return a * 1.000001

    cp(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        x = cp(x)
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / REPS
    return 2 * x.nbytes / dt / 1e9


INSTANCES = {
    "maxG55": (maxcut_sdpa, dict(n=5000)),
    "torus22": (torus_sdpa, dict(side=22)),
    "theta12": (theta_sdpa, dict(n=600, n_edges=17978)),
}


def bucket_bytes(cs: ConeSystem, m: int) -> int:
    """Analytic bytes moved by one with-M KKT build (gather buckets)."""
    total = 0
    for ga in cs.groups:
        n = ga.C.shape[-1]
        if ga.dpos is not None:
            # U read (n^2) + Usq intermediate write/read (2 m^2 when
            # gathered; identity fuses to ~1) + M write (m^2) + rno
            # column reduction read (n^2)
            total += 8 * (2 * n * n + 3 * m * m)
        elif ga.spos is not None:
            r, _, c = ga.spos.shape
            pairs = r * (r + 1) // 2
            # per pair: c^2 gathered m x m reads + T write + M acc
            total += 8 * (pairs * (c * c + 2) * m * m + 2 * n * n)
    return total


def run(name: str, ceiling: float):
    gen, kw = INSTANCES[name]
    prob = SDPProblem.from_sdpa(gen(**kw))
    cs = ConeSystem(prob)
    # mirror the production TPU configuration (solver/algo.py gates):
    # the DD/MXU inverse + hp assembly, not the emulated-f64 trisolve
    from hdsdp_tpu.utils.platform import is_tpu

    if is_tpu():
        cs.kkt_hp = prob.m >= 2048
    m = prob.m
    y = jnp.zeros((m,), jnp.float64)
    shift = 10.0 + float(prob.features.obj_fro_norm)
    S, s_lp = cs.assemble(1.0, -1.0, y, shift)
    ok, L = cs.factor(S, s_lp)
    assert bool(ok)

    def timed(kind):
        out = cs.build_kkt(L, s_lp, -1.0, kind)  # compile
        jax.block_until_ready(out.asinv)
        t0 = time.perf_counter()
        for _ in range(REPS):
            jax.block_until_ready(cs.build_kkt(L, s_lp, -1.0, kind).asinv)
        return (time.perf_counter() - t0) / REPS

    dt_full = timed("inf")
    dt_rhs = timed("corr")  # U inverse + RHS only: no M accumulation
    dt_m = max(dt_full - dt_rhs, 1e-9)  # the gather-bucket M part

    nbytes = bucket_bytes(cs, m)
    gbs = nbytes / dt_m / 1e9
    print(json.dumps({
        "case": name, "m": m, "n": int(max(prob.block_dims)),
        "build_full_ms": round(dt_full * 1e3, 1),
        "build_rhs_ms": round(dt_rhs * 1e3, 1),
        "m_accum_ms": round(dt_m * 1e3, 1),
        "bytes_moved_gb": round(nbytes / 1e9, 2),
        "m_accum_gbs": round(gbs, 1),
        "hbm_ceiling_gbs": round(ceiling, 1),
        "pct_of_ceiling": round(100 * gbs / ceiling, 1),
    }), flush=True)


def main():
    ceiling = hbm_ceiling()
    print(json.dumps({"hbm_copy_ceiling_gbs": round(ceiling, 1)}), flush=True)
    for name in (sys.argv[1:] or ["maxG55", "torus22", "theta12"]):
        run(name, ceiling)


if __name__ == "__main__":
    main()
