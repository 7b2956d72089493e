"""One-shot large-instance TPU driver: single solve, peak-HBM report.

Generalizes the torus-22 driver to any synthetic family at published
SDPLIB sizes; used for the m >= 10k TPU evidence runs (torus-22,
theta12).  Round 5: NO pinned overrides — the fused "auto" HBM gate
(params.fused_hbm_budget) selects the host loop at torus-22 scale by
itself, so the zero-override default path is what this driver measures.

    python benchmarks/big_tpu.py torus22 [solver_kw=json ...]
    python benchmarks/big_tpu.py theta12 psdp=0
"""

import faulthandler
import json
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks
faulthandler.dump_traceback_later(1800, repeat=True)  # heartbeat on hangs

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import (
    control_sdpa,
    gpp_sdpa,
    maxcut_sdpa,
    qpg_sdpa,
    theta_sdpa,
    torus_sdpa,
)

# name -> (generator, kwargs).  Sizes are the published SDPLIB shapes.
INSTANCES = {
    "torus22": (torus_sdpa, dict(side=22)),            # m = n = 10648
    "theta12": (theta_sdpa, dict(n=600, n_edges=17978)),  # m = 17979, n = 600
    "theta6": (theta_sdpa, dict(n=300, n_edges=4374)),    # m = 4375, n = 300
    "maxG55": (maxcut_sdpa, dict(n=5000)),             # m = n = 5000
    # multi-block / mixed-cone breadth at published size (VERDICT r4 #6)
    "control10": (control_sdpa, dict(k=50, n_sys=2)),  # control10 class:
    #   blocks [100, 50], m ~ 1275 — multi-block Lyapunov structure
    "equalG51": (gpp_sdpa, dict(n=1000)),              # n = 1000, m = 1001:
    #   diag bucket + dense all-ones row (equalG51 published shape)
    "qpG51": (qpg_sdpa, dict(n=1000)),                 # SDP 1000 + LP 1000,
    #   m = 1000: SDP+LP coupling at qpG51's published shape
}

name = sys.argv[1] if len(sys.argv) > 1 else "torus22"
# non-JSON values pass as strings
overrides = {}
for arg in sys.argv[2:]:
    k, v = arg.split("=", 1)
    try:
        overrides[k] = json.loads(v)
    except ValueError:
        overrides[k] = v

gen, kw = INSTANCES[name]
t0 = time.time()
prob = SDPProblem.from_sdpa(gen(**kw))
print(f"[{name}] m={prob.m} n={max(prob.block_dims)} presolve "
      f"{time.time() - t0:.1f}s", flush=True)

from hdsdp_tpu.solver import dimacs as dimacs_mod
from hdsdp_tpu.solver.solver import HDSDPSolver

# time the whole post-solve check_solution call (recovery + min-eig +
# error assembly); at torus-22 scale it is a large fraction of the warm
# wall (NOTES r3).  Any PSDP in-solve recovery time is NOT in this tail.
_tails = {}


def _timed_check(f=dimacs_mod.check_solution):
    def inner(*a, **kw):
        s = time.time()
        out = f(*a, **kw)
        _tails["check_solution"] = (
            _tails.get("check_solution", 0.0) + time.time() - s
        )
        return out
    return inner


dimacs_mod.check_solution = _timed_check()

t0 = time.time()
solver = HDSDPSolver(prob, **overrides)
r = solver.optimize()
t = time.time() - t0

peak = None
try:
    stats = jax.devices()[0].memory_stats()
    peak = stats.get("peak_bytes_in_use")
except Exception:
    pass

if getattr(solver.ipm, "region", None) is not None:
    print("--- stage profile (host-loop regions) ---", flush=True)
    print(solver.ipm.region.report(), flush=True)

print(json.dumps({
    "instance": name,
    "m": prob.m,
    "n": int(max(prob.block_dims)),
    "status": r.status,
    "d_obj": r.d_obj,
    "iters": r.n_iters,
    "wall_s": round(t, 2),
    "s_per_iter": round(t / max(r.n_iters, 1), 3),
    "dimacs_max": float(np.max(np.abs(r.dimacs))),
    "dimacs": [float(f"{e:.3e}") for e in r.dimacs],
    "peak_hbm_gb": round(peak / 2**30, 2) if peak else None,
    "tail_s": {k: round(v, 2) for k, v in _tails.items()},
    "check_detail": {
        k: round(v, 2)
        for k, v in getattr(solver.ipm, "_check_times", {}).items()
    },
    "cg": solver.ipm._factor_stats.get("cg_summary"),
}), flush=True)
