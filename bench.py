"""Benchmark driver: prints ONE JSON line.

Metric: warm end-to-end wall time of the mcp100.dat-s solve (the
reference's only published benchmark: 0.1 s on 1 CPU thread,
doc/hdsdp_doc.tm:1598,1614).  ``vs_baseline`` is the speedup factor
baseline_time / our_time (>1 means faster than the reference).

A persistent XLA compilation cache keeps recompilation out of the
measurement; the first (cold) solve warms both the cache and the device.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

MCP100 = "/root/reference/examples/mcp100.dat-s"
BASELINE_S = 0.1  # ref doc/hdsdp_doc.tm:1598,1614 (1 CPU thread)
GOLDEN_OBJ = -226.15735148  # ref doc/hdsdp_doc.tm:1606-1612


def main():
    from hdsdp_tpu.solver.solver import solve_sdpa_file

    if not os.path.exists(MCP100):
        # fall back to a synthetic instance of the same scale
        from hdsdp_tpu.models.problem import SDPProblem
        from hdsdp_tpu.models.synthetic import random_sdpa
        from hdsdp_tpu.solver.solver import HDSDPSolver

        data = random_sdpa(m=100, block_dims=[100], seed=7)
        prob = SDPProblem.from_sdpa(data)

        def run():
            return HDSDPSolver(prob, verbose=False).optimize()

    else:

        def run():
            return solve_sdpa_file(MCP100, verbose=False)

    r = run()  # cold: compile + execute
    ok = r.status == "PRIMAL_DUAL_OPTIMAL" and abs(r.d_obj - GOLDEN_OBJ) < 1e-4 * abs(
        GOLDEN_OBJ
    ) if os.path.exists(MCP100) else r.status == "PRIMAL_DUAL_OPTIMAL"

    t0 = time.time()
    r = run()  # warm
    t = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "mcp100_warm_solve_s" if ok else "mcp100_warm_solve_s_FAILED",
                "value": round(t, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / t, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
