"""Benchmark driver: prints ONE JSON line.

Metric: warm end-to-end wall time of maxG55 (SDPLIB maxcut family at its
published size, n = m = 5000) on the accelerator — the largest instance
the reference binary completes on this box within an hour — or maxG51
(n = m = 1000) on the CPU fallback.  ``vs_baseline`` is
baseline_time / our_time (>1 = faster than the reference).

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

# Reference binary on this machine, same instances (see module docstring).
# maxG51: sdpasolve 23.7 s, dObj -2.6142702231e+02 (35 iters).
# maxG55 (n = m = 5000): sdpasolve optimization time 2931.9 s (total
# 3070.0 s), dObj -1.3466413695e+03, DIMACS max 5.81e-09 (2026-08-19,
# 1 BLAS thread, byte-identical /tmp/maxG55_synth.dat-s via write_sdpa).
# toruspm3-22 (n = m = 10648): sdpasolve optimization time 22274.8 s
# (total 23274.5 s), dObj -2.7298678860e+03, DIMACS max 1.87e-09
# (2026-08-19, byte-identical /tmp/torus22_synth.dat-s; full log
# /tmp/torus22_ref_long.log).  Ours runs psdp=0 there: the PSDP
# contraction floor (1 - 1/sqrt(n)) is useless at n = 10648 and its
# X-side machinery doubles peak HBM.
CASES = {
    # name: (family, gen_kwargs, baseline_s, golden_dObj, overrides)
    "maxG51": ("maxcut", dict(n=1000), 23.7, -261.4270223, {}),
    "maxG55": ("maxcut", dict(n=5000), 2931.9, -1346.6413695, {}),
    "torus22": ("torus", dict(side=22), 22274.8, -2729.8678860,
                dict(psdp=0)),
}


def _bench_case(name: str):
    from hdsdp_tpu.models.problem import SDPProblem
    from hdsdp_tpu.models.synthetic import maxcut_sdpa, torus_sdpa
    from hdsdp_tpu.solver.solver import HDSDPSolver

    fam, kw, baseline_s, golden_obj, overrides = CASES[name]
    gen = {"maxcut": maxcut_sdpa, "torus": torus_sdpa}[fam]
    prob = SDPProblem.from_sdpa(gen(**kw))

    def run():
        return HDSDPSolver(prob, verbose=False, **overrides).optimize()

    r = run()  # cold: compile + execute
    ok = r.status == "PRIMAL_DUAL_OPTIMAL" and abs(r.d_obj - golden_obj) < 1e-6 * abs(
        golden_obj
    )

    t0 = time.time()
    r = run()  # warm
    t = time.time() - t0

    metric = f"{name}_warm_solve_s" if ok else f"{name}_warm_solve_s_FAILED"
    if _ON_CPU:
        metric += "_cpu_fallback"  # accelerator tunnel was unreachable
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(t, 3),
                "unit": "s",
                "vs_baseline": round(baseline_s / t, 4),
            }
        ),
        flush=True,
    )


def main():
    # Stable bench contract (round 3+): emit BOTH maxG51 and maxG55 every
    # round so BENCH_r{N} files stay comparable across rounds.  The
    # LAST line is the headline the driver records (maxG55 on the
    # accelerator).  The CPU fallback keeps only the faster maxG51 so a
    # broken tunnel still yields a number.
    if _ON_CPU:
        _bench_case("maxG51")
        return
    _bench_case("maxG51")
    _bench_case("maxG55")
    _bench_case("torus22")


if __name__ == "__main__":
    main()
