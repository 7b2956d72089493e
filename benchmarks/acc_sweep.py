"""Accuracy flag sweep on one instance (TPU): which precision knob
causes the DIMACS plateau?  Runs maxG51 under a ladder of configs and
prints one line per config.

    python benchmarks/acc_sweep.py [instance]
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

import numpy as np

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import maxcut_sdpa, torus_sdpa
from hdsdp_tpu.solver.solver import HDSDPSolver

INSTANCES = {
    "maxG51": (maxcut_sdpa, dict(n=1000)),
    "maxG55": (maxcut_sdpa, dict(n=5000)),
    "torus22": (torus_sdpa, dict(side=22)),
}
name = sys.argv[1] if len(sys.argv) > 1 else "maxG51"
gen, kw = INSTANCES[name]
prob = SDPProblem.from_sdpa(gen(**kw))

CONFIGS = [
    ("host_default", dict(fused=False)),
    ("host_cone_f64", dict(fused=False, cone_fp="off")),
    ("host_kkt_f64", dict(fused=False, kkt_fp="xla")),
    ("fused_default", dict()),
    ("fused_mp_off", dict(kkt_mp="off")),
    ("fused_cone_f64", dict(cone_fp="off")),
]

only = set(sys.argv[2:])
for label, ov in CONFIGS:
    if only and label not in only:
        continue
    t0 = time.time()
    s = HDSDPSolver(prob, verbose=False, **ov)
    r = s.optimize()
    t = time.time() - t0
    tr = getattr(s.ipm, "_maker_trace", [])
    tail = [
        {k: (f"{v:.2e}" if isinstance(v, float) else v) for k, v in ev.items()}
        for ev in tr[-6:]
    ]
    print(json.dumps({
        "cfg": label, "status": r.status, "iters": r.n_iters,
        "wall_s": round(t, 1),
        "dimacs_max": float(f"{np.max(np.abs(r.dimacs)):.3e}"),
        "dimacs": [float(f"{e:.2e}") for e in r.dimacs],
        "acc_mu": float(f"{s.ipm.maker_acc.mu:.3e}"),
        "dobj": r.d_obj,
        "trace_tail": tail,
    }), flush=True)
