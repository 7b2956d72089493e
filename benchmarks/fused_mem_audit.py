"""AOT memory audit of the fused iter-mode bodies at a given size.

Compiles the phase-A / phase-B iteration bodies for the instance's
shapes WITHOUT running them and prints XLA's memory analysis —
the evidence for whether the fused path fits at torus-22 scale
(round-3: phase-B runtime-OOM; round-4: identity-diag removed ~2 m^2
gather copies from every build).

    python benchmarks/fused_mem_audit.py torus22
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.models.synthetic import maxcut_sdpa, theta_sdpa, torus_sdpa
from hdsdp_tpu.solver import fused
from hdsdp_tpu.solver.algo import DualIPM
from hdsdp_tpu.solver.params import Params, adjust_params

INSTANCES = {
    "torus22": (torus_sdpa, dict(side=22)),
    "maxG55": (maxcut_sdpa, dict(n=5000)),
    "theta12": (theta_sdpa, dict(n=600, n_edges=17978)),
}

name = sys.argv[1] if len(sys.argv) > 1 else "torus22"
gen, kw = INSTANCES[name]
prob = SDPProblem.from_sdpa(gen(**kw))
params = Params(verbose=False, psdp=0)
ipm = DualIPM(prob, params)

# mirror solve_fused's trace-time configuration
fused._KKT_CFG["mp"] = fused._use_mp(ipm)
fused._KKT_CFG["hp"] = ipm.cones.kkt_hp
fused._KKT_CFG["dhp"] = getattr(ipm.cones, "dual_hp", False)
fused._CONE_CFG["dd"] = ipm.cones.cone_dd
fused._RATIO_CFG["kwarm"] = params.lanczos_warm_dim

c = fused._cones_from_ipm(ipm)
p = fused._pars_from_ipm(ipm, "b")
st = fused._state_from_ipm(ipm)

for phase, mk in (
    ("phase_b_iter", lambda: fused.make_phase_b(
        params.corrector_b, params.max_iter, False, whole_phase=False)),
    ("phase_a_iter", lambda: fused.make_phase_a(
        params.corrector_a, params.max_iter, True, whole_phase=False)),
):
    body = mk()
    if phase == "phase_b_iter":
        args = ((st,) + fused.phase_b_init_extras(), c, p)
    else:
        import jax.numpy as jnp

        args = (st, c, p, jnp.asarray(ipm.Rd))
    try:
        lowered = body.lower(*args)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        print(json.dumps({
            "phase": phase,
            "m": prob.m,
            "mp": fused._KKT_CFG["mp"], "hp": fused._KKT_CFG["hp"],
            "dd": fused._CONE_CFG["dd"],
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
            "argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
            "output_gb": round(ma.output_size_in_bytes / 2**30, 2),
            "alias_gb": round(ma.alias_size_in_bytes / 2**30, 2),
            "peak_est_gb": round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes - ma.alias_size_in_bytes)
                / 2**30, 2),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"phase": phase, "error": str(e)[:300]}), flush=True)
