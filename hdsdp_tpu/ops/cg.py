"""Preconditioned conjugate gradients for the Schur system.

Mirrors the reference's default Schur-complement backend
(HDSDP_LINSYS_DENSE_ITERATIVE, ref linalg/hdsdp_linsolver.c:1289-1660 and
interface/hdsdp_schur.c:19): Jacobi-preconditioned CG with periodic
restarts, an early bail-out when convergence stalls, and escalation to a
Cholesky preconditioner (== direct solve for dense M) on failure.  The
ADPCG side-car (ref derivative/ADPCG/src/adpcg.c) generalizes the same
rule-based preconditioner-refresh policy; `AdaptiveCG` carries its
analogue across IPM iterations: the Cholesky preconditioner may be REUSED
(stale) for several consecutive KKT systems, refreshed only when the
iteration count degrades.

The CG loop itself is one jitted ``lax.while_loop`` (single dispatch).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hdsdp_tpu.ops import chol as chol_ops

STATUS_OK = 0
STATUS_MAXITER = 1
STATUS_NUMERICAL = 2


class CGResult(NamedTuple):
    x: jnp.ndarray
    status: jnp.ndarray  # int32
    iters: jnp.ndarray  # int32
    resi_norm: jnp.ndarray


@partial(jax.jit, static_argnames=("max_iter", "restart_freq", "use_chol"))
def pcg(
    M,
    rhs,
    precond,  # diag vector (Jacobi) or Cholesky factor L (use_chol=True)
    max_iter: int,
    restart_freq: int = 20,
    abs_tol: float = 1e-06,
    rel_tol: float = 1e-06,
    use_chol: bool = False,
):
    """Single-RHS PCG on symmetric PD M (ref conjGradSolve, :1446-1588)."""

    def apply_p(v):
        if use_chol:
            return chol_ops.chol_solve(precond, v)
        return v / precond

    rhs_norm = jnp.linalg.norm(rhs)
    tol = jnp.maximum(
        jnp.minimum(abs_tol, rhs_norm * rel_tol), 0.1 * abs_tol
    )

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    d0 = apply_p(r0)
    z0 = d0
    Md0 = M @ d0

    def cond(c):
        x, r, d, z, Md, it, status = c
        return status < 0

    def body(c):
        x, r, d, z, Md, it, status = c
        rz = z @ r
        dMd = d @ Md
        alpha = rz / dMd
        x = x + alpha * d

        def restart(args):
            x, r, d, z, Md = args
            r = rhs - M @ x
            d = apply_p(r)
            Md = M @ d
            z = apply_p(r)
            return x, r, d, z, Md

        def advance(args):
            x, r, d, z, Md = args
            r_new = r - alpha * Md
            z_new = apply_p(r_new)
            beta = (r_new @ z_new) / rz
            d_new = z_new + beta * d
            return x, r_new, d_new, z_new, M @ d_new

        do_restart = jnp.logical_and(
            jnp.asarray(not use_chol), (it % restart_freq) == 5
        )
        x, r, d, z, Md = jax.lax.cond(do_restart, restart, advance, (x, r, d, z, Md))

        rn = jnp.linalg.norm(r)
        status = jnp.where(rn != rn, STATUS_NUMERICAL, status)  # NaN
        status = jnp.where(
            jnp.logical_and(status < 0, rn < tol), STATUS_OK, status
        )
        # stall bail-out (ref :1543-1546)
        status = jnp.where(
            jnp.logical_and(
                status < 0,
                jnp.logical_and(it > 20, rn > 0.01 * rhs_norm),
            ),
            STATUS_MAXITER,
            status,
        )
        status = jnp.where(
            jnp.logical_and(status < 0, it + 1 >= max_iter),
            STATUS_MAXITER,
            status,
        )
        return x, r, d, z, Md, it + 1, status

    init_status = jnp.where(
        jnp.linalg.norm(r0) < tol, STATUS_OK, jnp.asarray(-1, jnp.int32)
    )
    x, r, d, z, Md, it, status = jax.lax.while_loop(
        cond, body, (x0, r0, d0, z0, Md0, jnp.asarray(0, jnp.int32), init_status)
    )
    return CGResult(
        x=x, status=status.astype(jnp.int32), iters=it,
        resi_norm=jnp.linalg.norm(r),
    )


class AdaptiveCG:
    """Host-side policy wrapper: Jacobi -> (stale) Cholesky escalation.

    Carries a possibly stale Cholesky preconditioner across consecutive
    KKT systems (the ADPCG idea): refreshed only when CG with the stale
    factor stops converging quickly.  Multi-RHS solves vmap the single
    while-loop PCG over the columns (one dispatch for all right-hand
    sides).  Callers must check ``last_status`` / the ``ok`` flag of the
    *_checked entry points: on failure the caller escalates to a direct
    factorization (ref HFpLinsysSwitchToIndefinite,
    hdsdp_linsolver.c:1827-1857) instead of iterating on NaNs.
    """

    def __init__(self, max_iter=None, restart_freq=20,
                 abs_tol=1e-06, rel_tol=1e-06, reuse_threshold=15):
        self.max_iter = max_iter
        self.restart_freq = restart_freq
        self.abs_tol = abs_tol
        self.rel_tol = rel_tol
        self.reuse_threshold = reuse_threshold
        self.chol_fac = None  # stale Cholesky preconditioner
        self.n_factor = 0
        self.n_solve = 0
        self.last_iters = 0
        self.last_status = STATUS_OK

    def _direct_factor(self, M):
        L = jnp.linalg.cholesky(M)
        self.n_factor += 1
        return L

    def _run(self, M, rhs_mat, precond, use_chol):
        """Vmapped PCG over RHS columns: rhs_mat [m, k] -> CGResult batched."""
        m = M.shape[0]
        max_iter = self.max_iter or max(50, m // 20)
        f = partial(
            pcg, max_iter=max_iter, restart_freq=self.restart_freq,
            abs_tol=self.abs_tol, rel_tol=self.rel_tol, use_chol=use_chol,
        )
        return jax.vmap(f, in_axes=(None, 1, None))(M, rhs_mat, precond)

    def solve_mat_checked(self, M, rhs_mat):
        """Solve M X = rhs_mat [m, k].  Returns (X [m, k], ok)."""
        k = rhs_mat.shape[1]
        self.n_solve += k

        if self.chol_fac is not None:
            # stale-Cholesky-preconditioned CG (usually 1-5 iterations)
            res = self._run(M, rhs_mat, self.chol_fac, True)
            self.last_iters = int(jnp.max(res.iters))
            if bool(jnp.all(res.status == STATUS_OK)):
                self.last_status = STATUS_OK
                if self.last_iters > self.reuse_threshold:
                    self.chol_fac = None  # refresh next time
                return res.x.T, True
            self.chol_fac = None

        # Jacobi CG first (ref default), escalate to Cholesky on stall
        res = self._run(M, rhs_mat, jnp.diag(M), False)
        self.last_iters = int(jnp.max(res.iters))
        if bool(jnp.all(res.status == STATUS_OK)):
            self.last_status = STATUS_OK
            return res.x.T, True

        self.chol_fac = self._direct_factor(M)
        res = self._run(M, rhs_mat, self.chol_fac, True)
        self.last_iters = int(jnp.max(res.iters))
        self.last_status = int(jnp.max(res.status))
        ok = bool(jnp.all(res.status == STATUS_OK))
        if not ok:
            self.chol_fac = None  # the factor did not help; drop it
        return res.x.T, ok

    def solve_checked(self, M, rhs):
        """Solve M x = rhs.  Returns (x, ok)."""
        x, ok = self.solve_mat_checked(M, rhs[:, None])
        return x[:, 0], ok

    def solve(self, M, rhs):
        """Solve M x = rhs (unchecked; prefer solve_checked)."""
        x, _ = self.solve_checked(M, rhs)
        return x
