"""Primal recovery + DIMACS error check (ref HDSDPCheckSolution,
interface/hdsdp.c:771-933, and HConeGetPrimal / sdpDenseConeGetPrimal,
hdsdp_conic_sdp.c:2395-2446).

The primal matrix per cone is recovered from a recorded "maker"
(mu*, y*, dy*) as

    X = mu* ( Sbar^-1 + Sbar^-1 W Sbar^-1 ),   Sbar = C - A'y*,  W = A'(dy*)

computed here with batched Cholesky + congruence instead of the reference's
two triangular solve sweeps.  The full recovery + 6-error computation is
ONE jitted dispatch (`_dimacs_kernel`); only the maker-retry policy runs
on host.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hdsdp_tpu.ops import chol as chol_ops
from hdsdp_tpu.solver.cones import _assemble, _atx, _ctx, _factor


# above this block dimension the f64 min-eigenvalue check switches from
# exact (emulated, slow) f64 eigh to f32 eigh + f64 Rayleigh refinement
_EXACT_EIG_DIM = 384

# above this block dimension even the f32 eigh is ruled out: XLA's QDWH
# expansion holds ~20 O(n^2) f32 temps live and the DIMACS program
# compile-OOMs (observed 22.07G/15.75G at torus-22, n = 10648).  The
# minimum eigenvalue is instead estimated by a reorthogonalized Lanczos
# sweep on -X + one f64 Rayleigh quotient — the extreme-eigenvalue
# machinery the reference itself uses for step lengths
# (ref linalg/hdsdp_lanczos.c:161-292), here pointed at the PSD check.
_LANCZOS_EIG_DIM = 8192


def _lanczos_min_one(X: jnp.ndarray, krylov: int = 64,
                     restarts: int = 3) -> jnp.ndarray:
    """lambda_min estimate of one symmetric [n, n] block: restarted
    Lanczos on -X (full reorthogonalization, v0 = previous Ritz vector)
    + f64 Rayleigh quotient.  O(r k n^2) flops, O(k n) memory — no dense
    eig at any n.  Resolves lambda_min to ~1e-4 ||X|| even on clustered
    bottoms — well inside the 1e-2 DIMACS acceptance gate the value
    feeds (ref hdsdp.c:905-921); isolated negative directions converge
    to full precision."""
    n = X.shape[-1]

    def sweep(v):
        V = jnp.zeros((krylov + 1, n), X.dtype).at[0].set(v)
        alpha = jnp.zeros((krylov,), X.dtype)
        beta = jnp.zeros((krylov,), X.dtype)

        def body(i, c):
            V, alpha, beta = c
            vi = V[i]
            w = -(X @ vi)
            a = vi @ w
            w = w - a * vi
            # full reorth against the built basis (rows > i are 0)
            w = w - V.T @ (V @ w)
            b = jnp.linalg.norm(w)
            V = V.at[i + 1].set(jnp.where(b > 1e-300, w / b, 0.0))
            return V, alpha.at[i].set(a), beta.at[i].set(b)

        V, alpha, beta = jax.lax.fori_loop(0, krylov, body, (V, alpha, beta))
        T = (
            jnp.diag(alpha)
            + jnp.diag(beta[:-1], 1)
            + jnp.diag(beta[:-1], -1)
        )
        _, evecs = jnp.linalg.eigh(T)
        u = V[:krylov].T @ evecs[:, -1]  # Ritz vector of lambda_max(-X)
        return u / jnp.linalg.norm(u)

    v = jax.random.normal(jax.random.PRNGKey(7), (n,), X.dtype)
    u = v / jnp.linalg.norm(v)
    for _ in range(restarts):
        u = sweep(u)
    return u @ (X @ u)


def _uwu(U: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """Recovery congruence U W U per block [g, n, n].

    At n >= 8192 on TPU the f64 einsum's dot-emulation expands each
    operand to f32[8, n, n] temps (3.4 GB at torus-22) and the DIMACS
    program compile-OOMs; the Ozaki-sliced bf16 MXU matmul (ops.hpmm,
    ~2^-45 relative — orders below the 1e-2 DIMACS gate) keeps the
    peak at two bf16 slice sets instead."""
    n = U.shape[-1]
    big = U.ndim == 3 and U.shape[0] == 1 and n >= 8192
    if big:
        from hdsdp_tpu.utils.platform import is_tpu

        if is_tpu():
            from hdsdp_tpu.ops import hpmm

            T = hpmm.hpmm(U[0], W[0])
            return hpmm.hpmm(T, U[0])[None]
    return jnp.einsum("gij,gjk,gkl->gil", U, W, U, optimize=True)


def _batch_min_eval(Xg: jnp.ndarray) -> jnp.ndarray:
    """Min eigenvalue over a [g, n, n] symmetric block batch.

    Small blocks: exact eigvalsh in the working dtype.  Large f64
    blocks: TPU f64 eigh is software-emulated and dominates the DIMACS
    check at n >= 1000, so the minimizing eigenvector is located with a
    fast f32 eigh and the eigenvalue refined by one f64 Rayleigh
    quotient v'Xv.  The quotient error is O(||X|| sin^2 theta) for
    eigenvector angle error theta ~ 1e-7 — orders below the 1e-2 DIMACS
    acceptance gate (ref hdsdp.c:905-921) — and a genuinely negative
    direction at gate scale is fully resolved in f32.
    """
    n = Xg.shape[-1]
    if n < _EXACT_EIG_DIM or Xg.dtype != jnp.float64:
        return jnp.min(jnp.linalg.eigvalsh(Xg))
    if n >= _LANCZOS_EIG_DIM:
        return jnp.min(jax.vmap(_lanczos_min_one)(Xg))
    _, V = jnp.linalg.eigh(Xg.astype(jnp.float32))
    v = V[..., :, 0].astype(Xg.dtype)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.min(jnp.einsum("...i,...ij,...j->...", v, Xg, v))


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
        X = maker.mu * (U + _uwu(U, Wg))
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        X_list.append(X)

    x_lp = None
    if cones.has_lp:
        x_lp = maker.mu * (sbar_lp + w_lp) / (sbar_lp * sbar_lp)
    return X_list, x_lp


@partial(jax.jit, static_argnames=("m",))
def _dimacs_kernel(groups, lp, b, y, Rd, perturb, mk_mu, mk_y, mk_dy, m: int):
    """(ok, errs_raw..., p_obj, d_obj, compl, min_eval, p_infeas_norm).

    Returns raw (unscaled) quantities; the host applies the scaling factors
    and the reference's error normalizations.
    """
    Sbar, sbar_lp = _assemble(groups, lp, 1.0, -1.0, mk_y, perturb)
    ok, Lbar = _factor(Sbar, sbar_lp)
    W, w_lp = _assemble(groups, lp, 0.0, 1.0, mk_dy, 0.0)

    X_list = []
    for Lg, Wg in zip(Lbar, W):
        U = chol_ops.chol_inverse(Lg)
        X = mk_mu * (U + _uwu(U, Wg))
        X_list.append(0.5 * (X + jnp.swapaxes(X, -1, -2)))
    x_lp = (
        mk_mu * (sbar_lp + w_lp) / (sbar_lp * sbar_lp)
        if lp is not None
        else None
    )

    S, s_lp = _assemble(groups, lp, 1.0, -1.0, y, -Rd + perturb)

    d_obj = b @ y
    ax = _atx(groups, lp, tuple(X_list), x_lp, m)
    p_obj = _ctx(groups, lp, tuple(X_list), x_lp)

    compl = jnp.zeros((), b.dtype)
    for Xg, Sg in zip(X_list, S):
        compl = compl + jnp.sum(Xg * Sg)
    if lp is not None:
        compl = compl + x_lp @ s_lp

    min_eval = jnp.asarray(jnp.inf, b.dtype)
    for Xg in X_list:
        min_eval = jnp.minimum(min_eval, _batch_min_eval(Xg))
    if lp is not None:
        min_eval = jnp.minimum(min_eval, jnp.min(x_lp))

    p_inf_norm = jnp.linalg.norm(ax - b)
    return ok, p_obj, d_obj, compl, min_eval, p_inf_norm


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

    # the check recomputes everything from (y, makers, cone data); at
    # torus-22 scale the retained solve buffers would not fit beside
    # the recovery program's runtime peak
    ipm.release_solve_buffers()

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


def _errors_from_parts(ipm, p_obj, d_obj, compl, min_eval, p_inf_norm):
    f = ipm.f
    pd_scal = ipm.rhs_scal * ipm.obj_scal
    d_obj = d_obj / pd_scal
    p_obj = p_obj / pd_scal
    p_infeas = p_inf_norm / ipm.rhs_scal
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


def _dimacs_errors(ipm, maker) -> Optional[np.ndarray]:
    cones = ipm.cones

    if getattr(ipm, "psdp", None) is not None and getattr(ipm.psdp, "X", None) is not None:
        # PSDP-refined primal: compute errors from the explicit X (host)
        X_list, x_lp = ipm.psdp.get_primal()
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
            min_eval = min(min_eval, float(_batch_min_eval(Xg)))
        if cones.has_lp:
            min_eval = min(min_eval, float(jnp.min(x_lp)))
        p_inf_norm = float(jnp.linalg.norm(ax - ipm.b))
        return _errors_from_parts(ipm, p_obj, d_obj, compl, min_eval, p_inf_norm)

    out = _dimacs_kernel(
        cones.groups,
        cones.lp,
        ipm.b,
        jnp.asarray(ipm.y, ipm.dtype),
        jnp.asarray(ipm.Rd, ipm.dtype),
        jnp.asarray(ipm.perturb, ipm.dtype),
        jnp.asarray(maker.mu, ipm.dtype),
        jnp.asarray(maker.y, ipm.dtype),
        jnp.asarray(maker.dy, ipm.dtype),
        ipm.m,
    )
    ok, p_obj, d_obj, compl, min_eval, p_inf_norm = (np.asarray(v) for v in out)
    if not bool(ok):
        return None
    return _errors_from_parts(
        ipm, float(p_obj), float(d_obj), float(compl), float(min_eval),
        float(p_inf_norm),
    )
