"""Solve torus22 once, save the maker state, then diagnose the DIMACS
check stepwise (each error component printed separately).

    python benchmarks/torus22_checkit.py solve   # solve + save npz
    python benchmarks/torus22_checkit.py check   # load npz + diagnose
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
from hdsdp_tpu.models.synthetic import torus_sdpa
from hdsdp_tpu.solver import dimacs as dm
from hdsdp_tpu.solver.algo import DualIPM, Maker
from hdsdp_tpu.solver.params import Params

NPZ = "/tmp/torus22_state.npz"
mode = sys.argv[1] if len(sys.argv) > 1 else "check"

prob = SDPProblem.from_sdpa(torus_sdpa(side=22))

if mode == "solve":
    from hdsdp_tpu.solver.solver import HDSDPSolver

    s = HDSDPSolver(prob, fused=False, psdp=0, verbose=True)
    ipm = DualIPM(prob, s.params)
    s.ipm = ipm
    t0 = time.time()
    ipm.solve()
    print(f"solve done: {ipm.status} in {time.time()-t0:.1f}s, "
          f"iters={ipm.n_iter}", flush=True)
    np.savez(
        NPZ,
        y=np.asarray(ipm.y), Rd=ipm.Rd, perturb=ipm.perturb,
        acc_mu=ipm.maker_acc.mu,
        acc_y=np.asarray(ipm.maker_acc.y) if ipm.maker_acc.mu > 0 else np.zeros(1),
        inacc_mu=ipm.maker_inacc.mu,
        inacc_y=np.asarray(ipm.maker_inacc.y) if ipm.maker_inacc.mu > 0 else np.zeros(1),
    )
    print("state saved", flush=True)
    sys.exit(0)

# ---- check mode -------------------------------------------------------
z = np.load(NPZ)
params = Params(fused=False, psdp=0, verbose=False)
ipm = DualIPM(prob, params)
ipm.y = jnp.asarray(z["y"])
ipm.Rd = float(z["Rd"])
ipm.perturb = float(z["perturb"])
ipm.maker_acc = Maker(mu=float(z["acc_mu"]), y=jnp.asarray(z["acc_y"]), dy=None)
ipm.maker_inacc = Maker(
    mu=float(z["inacc_mu"]), y=jnp.asarray(z["inacc_y"]), dy=None)
print(f"makers: acc_mu={ipm.maker_acc.mu:.3e} inacc_mu={ipm.maker_inacc.mu:.3e}",
      flush=True)

maker = ipm.maker_acc if ipm.maker_acc.mu > 0 else ipm.maker_inacc
cones = ipm.cones
hp = bool(getattr(cones, "kkt_hp", False))

t0 = time.time()
ok, Us, sbar_lp, M, d_bound, rhs = dm._maker_kkt(
    cones.groups, cones.lp, ipm.b,
    jnp.asarray(maker.mu, ipm.dtype), jnp.asarray(maker.y, ipm.dtype),
    jnp.asarray(ipm.perturb, ipm.dtype),
    jnp.asarray(ipm.bound_lo, ipm.dtype), jnp.asarray(ipm.bound_up, ipm.dtype),
    ipm.m, hp, True,
)
print(f"maker_kkt: ok={bool(ok)} t={time.time()-t0:.1f}s "
      f"M_finite={bool(jnp.all(jnp.isfinite(M)))} "
      f"rhs_norm={float(jnp.linalg.norm(rhs)):.3e}", flush=True)

t0 = time.time()
lok, dy = dm._chol_solve_ladder(M, rhs)
res = float(jnp.linalg.norm(M @ dy - rhs))
print(f"ladder: ok={bool(lok)} t={time.time()-t0:.1f}s "
      f"dy_norm={float(jnp.linalg.norm(dy)):.3e} resid={res:.3e} "
      f"rel={res/max(float(jnp.linalg.norm(rhs)),1e-300):.3e}", flush=True)
del M, rhs

t0 = time.time()
parts = dm._dimacs_eval(
    cones.groups, cones.lp, ipm.b,
    jnp.asarray(ipm.y, ipm.dtype), jnp.asarray(ipm.Rd, ipm.dtype),
    jnp.asarray(ipm.perturb, ipm.dtype),
    jnp.asarray(maker.mu, ipm.dtype), dy, Us, sbar_lp, ipm.m,
)
p_obj, d_obj, compl, min_evals, lp_min, p_inf_norm, _X = parts
p_obj, d_obj, compl, p_inf_norm = (
    float(np.asarray(v)) for v in (p_obj, d_obj, compl, p_inf_norm)
)
min_eval = min([float(np.asarray(v)) for v in min_evals] + [float(lp_min)])
print(f"eval t={time.time()-t0:.1f}s", flush=True)
print(json.dumps({
    "p_obj": p_obj, "d_obj": d_obj, "gap": p_obj - d_obj,
    "compl": compl, "min_eval": min_eval, "p_inf_norm": p_inf_norm,
}), flush=True)
errs = dm._errors_from_parts(ipm, p_obj, d_obj, compl, min_eval, p_inf_norm)
print("errs:", " ".join(f"{e:9.2e}" for e in errs), flush=True)
