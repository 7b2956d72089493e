"""Primal recovery + DIMACS error check (ref HDSDPCheckSolution,
interface/hdsdp.c:771-933, and HConeGetPrimal / sdpDenseConeGetPrimal,
hdsdp_conic_sdp.c:2395-2446).

The primal matrix per cone is recovered from a recorded "maker"
(mu*, y*, dy*) as

    X = mu* ( Sbar^-1 + Sbar^-1 W Sbar^-1 ),   Sbar = C - A'y*,  W = A'(dy*)

computed here with batched Cholesky + congruence instead of the reference's
two triangular solve sweeps.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hdsdp_tpu.ops import chol as chol_ops


def recover_primal(ipm, maker) -> Optional[Tuple[List[jnp.ndarray], Optional[jnp.ndarray]]]:
    """X per SDP group + LP primal vector for a given maker; None if the
    maker's dual check matrix is not PD (recovery step infeasible)."""
    cones = ipm.cones
    # Sbar = C - A'y (+ perturb, folded in as for BUFFER_DUALCHECK)
    Sbar, sbar_lp = cones.assemble(1.0, -1.0, maker.y, ipm.perturb)
    ok, Lbar = cones.factor(Sbar, sbar_lp)
    if not bool(ok):
        return None
    # W = +A'(dy)  (BUFFER_DUALSTEP: no perturbation)
    W, w_lp = cones.assemble(0.0, 1.0, maker.dy, 0.0)

    X_list = []
    for Lg, Wg in zip(Lbar, W):
        U = chol_ops.chol_inverse(Lg)
        X = maker.mu * (U + jnp.einsum("gij,gjk,gkl->gil", U, Wg, U))
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        X_list.append(X)

    x_lp = None
    if cones.has_lp:
        x_lp = maker.mu * (sbar_lp + w_lp) / (sbar_lp * sbar_lp)
    return X_list, x_lp


def check_solution(ipm) -> np.ndarray:
    """Compute the 6 DIMACS errors and set the final status.

    Mirrors HDSDPCheckSolution including the acc -> inacc maker retry
    (ref hdsdp.c:905-918).
    """
    from hdsdp_tpu.solver import algo

    errs = np.ones(6)
    if ipm.maker_acc.mu <= 0.0 and ipm.maker_inacc.mu <= 0.0:
        ipm.status = algo.NUMERICAL
        return errs

    f = ipm.f
    use_acc = ipm.maker_acc.mu > 0.0

    while True:
        maker = ipm.maker_acc if use_acc else ipm.maker_inacc
        errs = _dimacs_errors(ipm, maker)
        if errs is None:
            errs = np.ones(6)
        max_err = float(np.max(np.abs(errs)))
        if max_err > 1e-02:
            if use_acc:
                # primal solution not good: switch maker (ref hdsdp.c:909-918)
                ipm.log.info("\nDealing with primal solution")
                use_acc = False
                if ipm.maker_inacc.mu > 0.0:
                    continue
            ipm.status = algo.NUMERICAL
        else:
            ipm.status = algo.PRIMAL_DUAL_OPTIMAL
        return errs


def _dimacs_errors(ipm, maker) -> Optional[np.ndarray]:
    f = ipm.f
    cones = ipm.cones

    rec = recover_primal(ipm, maker)
    if rec is None:
        return None
    X_list, x_lp = rec

    if getattr(ipm, "psdp", None) is not None and not isinstance(ipm.psdp, type(None)):
        try:
            X_list, x_lp = ipm.psdp.get_primal()
        except (NotImplementedError, AttributeError):
            pass

    # current duals S at (tau=1, y) with residual + perturb
    S, s_lp = cones.assemble(1.0, -1.0, ipm.y, -ipm.Rd + ipm.perturb)

    d_obj = float(ipm.b @ ipm.y)
    ax = cones.atx(X_list, x_lp)
    p_obj = float(cones.ctx(X_list, x_lp))

    compl = 0.0
    for Xg, Sg in zip(X_list, S):
        compl += float(jnp.sum(Xg * Sg))
    if cones.has_lp:
        compl += float(x_lp @ s_lp)

    min_eval = np.inf
    for Xg in X_list:
        w = jnp.linalg.eigvalsh(Xg)
        min_eval = min(min_eval, float(jnp.min(w)))
    if cones.has_lp:
        min_eval = min(min_eval, float(jnp.min(x_lp)))

    pd_scal = ipm.rhs_scal * ipm.obj_scal
    d_obj /= pd_scal
    p_obj /= pd_scal

    p_infeas = float(jnp.linalg.norm(ax - ipm.b)) / ipm.rhs_scal
    d_infeas = ipm.perturb * np.sqrt(max(f.n_sum_cone_dims, 1)) / ipm.obj_scal

    errs = np.zeros(6)
    errs[0] = p_infeas / (1.0 + f.rhs_one_norm)
    errs[1] = -min_eval / (1.0 + f.rhs_one_norm) if min_eval < 0.0 else 0.0
    errs[2] = d_infeas / (1.0 + f.obj_one_norm)
    errs[3] = 0.0
    errs[4] = (p_obj - d_obj) / (abs(p_obj) + abs(d_obj) + 1.0)
    errs[5] = compl / (abs(p_obj) + abs(d_obj) + 1.0)

    ipm.p_obj_val = p_obj
    ipm.d_obj_val = d_obj
    return errs
