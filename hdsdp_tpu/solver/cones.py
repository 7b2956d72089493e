"""Functional cone system: batched dual buffers, factors and KKT builds.

This is the TPU equivalent of the reference's cone vtable layer
(ref interface/hdsdp_conic.c + def_hdsdp_conic.h:56-107).  Instead of ~30
function pointers mutating per-cone buffers, cone state is an explicit
pytree (tuples of batched arrays) and every operation is a pure jitted
function over it:

  assemble  ~ HConeUpdate / coneInteriorCheckExpert buffer assembly
  factor    ~ HFpLinsysPsdCheck over every cone at once
  build_kkt ~ HKKTBuildUp (ref interface/hdssdp_schur.c:256-268)
  ratio_test~ HConeRatioTest (Lanczos / exact eigh)
  logdet    ~ HConeGetLogBarrier
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hdsdp_tpu.models.problem import SDPProblem
from hdsdp_tpu.ops import chol as chol_ops
from hdsdp_tpu.ops import ratio as ratio_ops
from hdsdp_tpu.ops import schur as schur_ops
from hdsdp_tpu.ops.schur import GroupArrays, LPArrays

INF = 1e30


class KKTOut(NamedTuple):
    M: Optional[jnp.ndarray]
    asinv: jnp.ndarray
    asinvrdsinv: jnp.ndarray
    asinvcsinv: Optional[jnp.ndarray]
    csinv: jnp.ndarray
    csinvcsinv: jnp.ndarray
    csinvrdsinv: jnp.ndarray
    trace_sinv: jnp.ndarray


class ConeSystem:
    """Holds device-side cone data and compiled cone operations."""

    def __init__(self, prob: SDPProblem, obj_scal: float = 1.0, dtype=jnp.float64):
        self.m = prob.m
        self.dtype = dtype
        self.groups: List[GroupArrays] = []
        self.group_dims: List[int] = []
        self.group_nblk: List[int] = []
        for g in prob.groups:
            self.groups.append(
                GroupArrays(
                    C=jnp.asarray(g.C * obj_scal, dtype),
                    F=jnp.asarray(g.F, dtype),
                    lam=jnp.asarray(g.lam, dtype),
                    seg=jnp.asarray(g.seg, jnp.int32),
                    Ad=jnp.asarray(g.Ad, dtype),
                    didx=jnp.asarray(g.didx, jnp.int32),
                    dblk=jnp.asarray(g.dblk, jnp.int32),
                )
            )
            self.group_dims.append(g.dim)
            self.group_nblk.append(g.nblk)

        self.has_lp = prob.lp is not None
        if self.has_lp:
            self.lp = LPArrays(
                A=jnp.asarray(prob.lp.A, dtype),
                c=jnp.asarray(prob.lp.c * obj_scal, dtype),
            )
        else:
            self.lp = None

        # sum of SDP cone dims + LP dims (bound cone counted by the solver)
        self.sum_cone_dims = prob.sum_cone_dims
        self.n_cones = len(prob.block_dims) + (1 if self.has_lp else 0)

        self._assemble = jax.jit(self._assemble_impl, static_argnames=())
        self._factor = jax.jit(self._factor_impl)
        self._logdet = jax.jit(self._logdet_impl)
        self._build_kkt = jax.jit(self._build_kkt_impl, static_argnames=("kind",))
        self._ratio = jax.jit(self._ratio_impl)
        self._add_step_check = jax.jit(self._add_step_check_impl)

    # -- buffer assembly ------------------------------------------------
    def _assemble_impl(self, dC, scal, y, dEye):
        S = tuple(
            schur_ops.group_dual(ga, dC, scal, y, dEye) for ga in self.groups
        )
        s_lp = (
            schur_ops.lp_dual(self.lp, dC, scal, y, dEye) if self.has_lp else None
        )
        return S, s_lp

    def assemble(self, dC, scal, y, dEye):
        """B = dEye*I + scal*A'y + dC*C per cone."""
        return self._assemble(dC, scal, y, dEye)

    # -- factorization / PSD check --------------------------------------
    def _factor_impl(self, S, s_lp):
        Ls = []
        ok = jnp.asarray(True)
        for Sg in S:
            good, L = chol_ops.psd_check(Sg)
            Ls.append(L)
            ok = jnp.logical_and(ok, good)
        if self.has_lp:
            ok = jnp.logical_and(ok, jnp.all(s_lp > 0))
        return ok, tuple(Ls)

    def factor(self, S, s_lp):
        return self._factor(S, s_lp)

    # -- barrier ---------------------------------------------------------
    def _logdet_impl(self, L, s_lp):
        val = jnp.zeros((), self.dtype)
        for Lg in L:
            val = val + chol_ops.chol_logdet(Lg)
        if self.has_lp:
            val = val + jnp.sum(jnp.log(s_lp))
        return val

    def logdet(self, L, s_lp):
        return self._logdet(L, s_lp)

    # -- KKT build --------------------------------------------------------
    def _build_kkt_impl(self, L, s_lp, Rd, kind: str) -> KKTOut:
        m = self.m
        with_m = kind != "corr"
        M = jnp.zeros((m, m), self.dtype) if with_m else None
        asinv = jnp.zeros((m,), self.dtype)
        trsas = jnp.zeros((m,), self.dtype)
        tr_u = jnp.zeros((), self.dtype)
        asinvcsinv = jnp.zeros((m,), self.dtype) if kind == "hsd" else None
        csinv = jnp.zeros((), self.dtype)
        csinvcsinv = jnp.zeros((), self.dtype)
        csinvrdsinv = jnp.zeros((), self.dtype)

        for ga, Lg in zip(self.groups, L):
            U = chol_ops.chol_inverse(Lg)
            out = schur_ops.group_schur(ga, U, m, with_m=with_m)
            if with_m:
                M = M + out.M
            asinv = asinv + out.asinv
            trsas = trsas + out.trSAS
            tr_u = tr_u + out.trU
            if kind == "hsd":
                h = schur_ops.group_hsd(ga, U, m)
                asinvcsinv = asinvcsinv + h.asinvcsinv
                csinv = csinv + h.csinv
                csinvcsinv = csinvcsinv + h.csinvcsinv
                csinvrdsinv = csinvrdsinv + Rd * h.trUCU

        if self.has_lp:
            out = schur_ops.lp_schur(self.lp, s_lp, m, with_m=with_m)
            if with_m:
                M = M + out.M
            asinv = asinv + out.asinv
            trsas = trsas + out.trSAS
            tr_u = tr_u + out.trU
            if kind == "hsd":
                h = schur_ops.lp_hsd(self.lp, s_lp, m)
                asinvcsinv = asinvcsinv + h.asinvcsinv
                csinv = csinv + h.csinv
                csinvcsinv = csinvcsinv + h.csinvcsinv
                # LP CSinvRdSinv intentionally omitted (ref quirk)

        return KKTOut(
            M=M,
            asinv=asinv,
            asinvrdsinv=Rd * trsas,
            asinvcsinv=asinvcsinv,
            csinv=csinv,
            csinvcsinv=csinvcsinv,
            csinvrdsinv=csinvrdsinv,
            trace_sinv=tr_u,
        )

    def build_kkt(self, L, s_lp, Rd, kind: str) -> KKTOut:
        """kind in {"inf", "hsd", "corr"} ~ KKT_TYPE_* (ref hdsdp_conic.h:16-19)."""
        return self._build_kkt(L, s_lp, Rd, kind)

    # -- ratio test --------------------------------------------------------
    def _ratio_impl(self, L, s_lp, dS, ds_lp):
        step = jnp.asarray(INF, self.dtype)
        for Lg, dSg in zip(L, dS):
            steps = ratio_ops.exact_ratio_test(Lg, dSg)
            step = jnp.minimum(step, jnp.min(steps))
        if self.has_lp:
            step_lp = ratio_ops.vector_ratio_test(s_lp, ds_lp)
            step = jnp.minimum(step, step_lp)
        return step

    def ratio_test(self, L, s_lp, dS, ds_lp):
        """Max alpha with S + alpha*dS >= 0 over all cones
        (ref HConeRatioTest; LP part per hdsdp_conic_lp.c:228-243)."""
        return self._ratio(L, s_lp, dS, ds_lp)

    # -- add step to buffer and check (ref sdpDenseConeAddStepToBufferAndCheck)
    def _add_step_check_impl(self, S, s_lp, dS, ds_lp, alpha):
        S_new = tuple(Sg + alpha * dSg for Sg, dSg in zip(S, dS))
        s_new = s_lp + alpha * ds_lp if self.has_lp else None
        ok, Lnew = self._factor_impl(S_new, s_new)
        return ok, S_new, s_new, Lnew

    def add_step_check(self, S, s_lp, dS, ds_lp, alpha):
        return self._add_step_check(S, s_lp, dS, ds_lp, alpha)

    # -- primal / misc helpers ---------------------------------------------
    def atx(self, X_list, x_lp):
        """A(X) over all cones."""
        out = jnp.zeros((self.m,), self.dtype)
        for ga, X in zip(self.groups, X_list):
            out = out + schur_ops.group_atx(ga, X, self.m)
        if self.has_lp:
            out = out + self.lp.A @ x_lp
        return out

    def ctx(self, X_list, x_lp):
        """<C, X> over all cones."""
        val = jnp.zeros((), self.dtype)
        for ga, X in zip(self.groups, X_list):
            val = val + jnp.sum(ga.C * X)
        if self.has_lp:
            val = val + self.lp.c @ x_lp
        return val
