"""Matrix-free operator-mode scale benchmark: solve a theta-class
instance whose dense Schur matrix could not exist on the device.

At m = 40001 a dense f64 M is 12.8 GB — more than any single
factorization could afford next to the cone buffers on a 16 GB device.
Operator mode (kkt_mode="free", auto above m >= 20000) never forms M:
every KKT solve is Jacobi-PCG on M v = A(S^-1 (sum_j v_j A_j) S^-1).

Usage:
    python benchmarks/opfree_bench.py [n] [edges]   # default 800 40000
"""

import json
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

import numpy as np

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import theta_sdpa
from hdsdp_tpu.solver.solver import HDSDPSolver

n = int(sys.argv[1]) if len(sys.argv) > 1 else 800
edges = int(sys.argv[2]) if len(sys.argv) > 2 else 40000

t0 = time.time()
data = theta_sdpa(n=n, n_edges=edges)
prob = SDPProblem.from_sdpa(data)
print(f"[opfree] m={prob.m} n={max(prob.block_dims)} presolve "
      f"{time.time() - t0:.1f}s  dense-M-would-be "
      f"{prob.m * prob.m * 8 / 2**30:.1f} GB", flush=True)

t0 = time.time()
solver = HDSDPSolver(prob)
r = solver.optimize()
t = time.time() - t0

ipm = solver.ipm
peak = None
try:
    stats = jax.devices()[0].memory_stats()
    peak = stats.get("peak_bytes_in_use")
except Exception:
    pass

print(json.dumps({
    "instance": f"theta-n{n}-m{prob.m}",
    "m": prob.m,
    "status": r.status,
    "d_obj": r.d_obj,
    "iters": r.n_iters,
    "wall_s": round(t, 2),
    "s_per_iter": round(t / max(r.n_iters, 1), 3),
    "dimacs_max": float(np.max(np.abs(r.dimacs))),
    "opcg_iters": ipm._factor_stats.get("opcg_iters"),
    "kkt_free": ipm.kkt_free,
    "peak_hbm_gb": round(peak / 2**30, 2) if peak else None,
}), flush=True)
