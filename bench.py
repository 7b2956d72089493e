"""Benchmark driver: prints ONE JSON line.

Metric: warm end-to-end wall time of maxG51 (SDPLIB maxcut family at its
published size, n = m = 1000), the largest instance both solvers complete
in minutes.  ``vs_baseline`` is baseline_time / our_time (>1 = faster
than the reference).

Baseline provenance: the reference binary was BUILT AND RUN ON THIS
MACHINE (cmake -DCMAKE_C_FLAGS=-DUNDERBLAS against the system
liblapack/libblas, 1 thread — the reference has no threading of its own
beyond BLAS) on the byte-identical instance, written with
hdsdp_tpu.io.sdpa.write_sdpa:

    /tmp/hdsdp_build/sdpasolve maxG51_synth.dat-s
      -> Primal dual optimal, dObj -2.6142702231e+02, 23.7 s (35 iters)

Our warm solve of the same instance: see BENCH_r*.json.  Golden check:
the objective must match the reference's to 1e-6 relative.  Context
numbers recorded in NOTES.md: theta6 (m=4375) ref 179.5 s vs ours
362.9 s; mcp100 ref 0.12 s vs ours ~2.2 s (latency-bound at m=100).

A persistent XLA compilation cache keeps recompilation out of the
measurement; the first (cold) solve warms the cache and the device.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _accelerator_ready(timeout_s: float = 180.0) -> bool:
    """Probe the accelerator in a SUBPROCESS: a hung TPU tunnel blocks
    backend init indefinitely (observed: 'TPU backend setup/compile
    error (Unavailable)' after ~25 min), which must not hang the bench.
    Falls back to CPU when the probe fails or times out."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "assert any(x.platform != 'cpu' for x in d)"],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except Exception:
        return False


_ON_CPU = False
if not _accelerator_ready():
    os.environ["JAX_PLATFORMS"] = "cpu"
    _ON_CPU = True

import jax

jax.config.update("jax_enable_x64", True)
if _ON_CPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Reference binary on this machine, same instance (see module docstring)
BASELINE_S = 23.7
GOLDEN_OBJ = -261.4270223  # reference sdpasolve dObj on maxG51_synth


def main():
    from hdsdp_tpu.models.problem import SDPProblem
    from hdsdp_tpu.models.synthetic import maxcut_sdpa
    from hdsdp_tpu.solver.solver import HDSDPSolver

    prob = SDPProblem.from_sdpa(maxcut_sdpa(n=1000))

    def run():
        return HDSDPSolver(prob, verbose=False).optimize()

    r = run()  # cold: compile + execute
    ok = r.status == "PRIMAL_DUAL_OPTIMAL" and abs(r.d_obj - GOLDEN_OBJ) < 1e-6 * abs(
        GOLDEN_OBJ
    )

    t0 = time.time()
    r = run()  # warm
    t = time.time() - t0

    metric = "maxG51_warm_solve_s" if ok else "maxG51_warm_solve_s_FAILED"
    if _ON_CPU:
        metric += "_cpu_fallback"  # accelerator tunnel was unreachable
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(t, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / t, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
