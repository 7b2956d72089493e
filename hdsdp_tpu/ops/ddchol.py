"""Blocked Cholesky in double-single (f32 pair) arithmetic on the MXU.

The reference's hot factorizations are f64 LAPACK dpotrf/dtrsm/dpotri
(ref linalg/hdsdp_linsolver.c:1044-1286).  On TPU, XLA emulates f64
Cholesky at ~0.02 Tflop/s with ~40+ ms intrinsic latency even at n=512.
This module reaches f64-parity (~2^-45) accuracy from f32/bf16 hardware:

  * storage: (hi, lo) f32 pairs (ops.dd), ~48 mantissa bits;
  * panel factorization: right-looking rank-1 loop in DD arithmetic on
    the VPU, producing both the panel factor and its inverse in one
    sweep (the inverse replaces LAPACK's dtrsm in the blocked update);
  * trailing updates / block solves: sliced-bf16 MXU matmuls (ops.hpmm)
    with exact in-chunk accumulation.

PSD-check semantics match the reference's try-Cholesky predicate
(ref hdsdp_linsolver.c:1112-1144): a non-PD input turns the factor NaN
via dd.sqrt and propagates; `ok()` is the NaN test.

The matrix is padded to a block multiple with an identity tail, so all
shapes are static under jit and the driver is a single `lax.fori_loop`
over panels.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import dd, hpmm


class DDFactor(NamedTuple):
    """Lower-triangular DD factor plus per-panel diagonal-block inverses."""

    lh: jnp.ndarray  # [np, np] f32
    ll: jnp.ndarray
    wh: jnp.ndarray  # [npan, B, B] f32 — inv of diagonal blocks of L
    wl: jnp.ndarray


def _panel_factor(ph, pl):
    """Factor a [B, B] DD block: returns (Lh, Ll, Wh, Wl) with W = L^-1.

    One right-looking rank-1 sweep; the inverse row j is built from the
    already-final rows of W (forward substitution interleaved with the
    factorization), so no separate trisolve is needed."""
    b = ph.shape[0]
    rid = jax.lax.broadcasted_iota(jnp.int32, (b,), 0)
    zeros = jnp.zeros_like(ph)

    def body(j, st):
        ph, pl, lh, ll, wh, wl = st
        ch = jax.lax.dynamic_slice(ph, (0, j), (b, 1))[:, 0]
        cl = jax.lax.dynamic_slice(pl, (0, j), (b, 1))[:, 0]
        djh = jax.lax.dynamic_slice(ch, (j,), (1,))
        djl = jax.lax.dynamic_slice(cl, (j,), (1,))
        sh, sl = dd.sqrt(djh, djl)          # NaN if diag <= 0 (PSD check)
        ish, isl = dd.inv(sh, sl)
        ch, cl = dd.mul(ch, cl, ish, isl)   # column/sqrt; row j -> sqrt
        keep = rid >= j
        ch = jnp.where(keep, ch, 0.0)
        cl = jnp.where(keep, cl, 0.0)
        lh = jax.lax.dynamic_update_slice(lh, ch[:, None], (0, j))
        ll = jax.lax.dynamic_update_slice(ll, cl[:, None], (0, j))
        # trailing update P -= c c^T (c is zero above j: cols < j untouched)
        oh, ol = dd.mul(ch[:, None], cl[:, None], ch[None, :], cl[None, :])
        ph, pl = dd.sub(ph, pl, oh, ol)
        # inverse row j: w_j = (e_j - L[j, :j] @ W) / L[j, j]
        rjh = jax.lax.dynamic_slice(lh, (j, 0), (1, b))[0]
        rjl = jax.lax.dynamic_slice(ll, (j, 0), (1, b))[0]
        left = rid < j
        rjh = jnp.where(left, rjh, 0.0)
        rjl = jnp.where(left, rjl, 0.0)
        th, tl = dd.mul(rjh[:, None], rjl[:, None], wh, wl)
        vh, vl = dd.dd_sum(th, tl, axis=0)
        eh = jnp.where(rid == j, 1.0, 0.0).astype(ph.dtype)
        uh, ul = dd.sub(eh, jnp.zeros_like(eh), vh, vl)
        wjh, wjl = dd.mul(uh, ul, ish, isl)
        wh = jax.lax.dynamic_update_slice(wh, wjh[None, :], (j, 0))
        wl = jax.lax.dynamic_update_slice(wl, wjl[None, :], (j, 0))
        return ph, pl, lh, ll, wh, wl

    st = (ph, pl, zeros, zeros, zeros, zeros)
    _, _, lh, ll, wh, wl = jax.lax.fori_loop(0, b, body, st)[0:6]
    return lh, ll, wh, wl


def _pad_spd(a, block):
    """Pad an SPD matrix to a block multiple with an identity tail."""
    n = a.shape[0]
    npad = -(-n // block) * block
    if npad == n:
        return a
    out = jnp.zeros((npad, npad), a.dtype)
    out = out.at[:n, :n].set(a)
    idx = jnp.arange(n, npad)
    return out.at[idx, idx].set(1.0)


@partial(jax.jit, static_argnames=("block",))
def factor(a, block=256):
    """DD blocked Cholesky of f64 SPD ``a`` -> DDFactor (internally padded).

    ref lapackLinSolverNumeric/dpotrf (hdsdp_linsolver.c:1146-1166)."""
    a = _pad_spd(a, block)
    npad = a.shape[0]
    npan = npad // block
    ah, al = dd.from_f64(a)
    lh = jnp.zeros_like(ah)
    ll = jnp.zeros_like(ah)
    whs = jnp.zeros((npan, block, block), jnp.float32)
    wls = jnp.zeros((npan, block, block), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)[:, 0]

    def panel_step(k, st):
        ah, al, lh, ll, whs, wls = st
        kb = k * block
        ph = jax.lax.dynamic_slice(ah, (kb, kb), (block, block))
        pl = jax.lax.dynamic_slice(al, (kb, kb), (block, block))
        plh, pll, pwh, pwl = _panel_factor(ph, pl)
        whs = jax.lax.dynamic_update_slice(whs, pwh[None], (k, 0, 0))
        wls = jax.lax.dynamic_update_slice(wls, pwl[None], (k, 0, 0))
        # L21 = A[below, panel] @ W^T  (replaces dtrsm)
        sth = jax.lax.dynamic_slice(ah, (0, kb), (npad, block))
        stl = jax.lax.dynamic_slice(al, (0, kb), (npad, block))
        below = (rows >= kb + block)[:, None]
        sth = jnp.where(below, sth, 0.0)
        stl = jnp.where(below, stl, 0.0)
        l21h, l21l = hpmm.hpmm_dd(
            sth, stl, jnp.swapaxes(pwh, 0, 1), jnp.swapaxes(pwl, 0, 1)
        )
        l21h = jnp.where(below, l21h, 0.0)
        l21l = jnp.where(below, l21l, 0.0)
        lh = jax.lax.dynamic_update_slice(lh, l21h, (0, kb))
        ll = jax.lax.dynamic_update_slice(ll, l21l, (0, kb))
        lh = jax.lax.dynamic_update_slice(lh, plh, (kb, kb))
        ll = jax.lax.dynamic_update_slice(ll, pll, (kb, kb))
        # trailing update A -= L21 L21^T (nonzero only in the trailing block)
        uh, ul = hpmm.hpmm_dd_syrk(l21h, l21l)
        ah, al = dd.sub(ah, al, uh, ul)
        return ah, al, lh, ll, whs, wls

    st = (ah, al, lh, ll, whs, wls)
    _, _, lh, ll, whs, wls = jax.lax.fori_loop(0, npan, panel_step, st)[0:6]
    return DDFactor(lh, ll, whs, wls)


def ok(f: DDFactor):
    """Factorization-success predicate (arithmetic NaN test; see
    ops.chol.chol_ok for why not isfinite)."""
    s = jnp.sum(f.lh - f.lh) + jnp.sum(f.wh - f.wh)
    return s == 0.0


def logdet(f: DDFactor, n: int):
    """log det(A) = 2 sum log diag(L) over the first n rows."""
    d = jnp.diagonal(f.lh)[:n].astype(jnp.float64) + jnp.diagonal(f.ll)[
        :n
    ].astype(jnp.float64)
    return 2.0 * jnp.sum(jnp.log(d))


def _block_matvec_dd(wh, wl, rh, rl):
    """[B,B] DD block times [B,r] DD block via VPU mul + tree sum."""
    th, tl = dd.mul(wh[:, :, None], wl[:, :, None], rh[None], rl[None])
    return dd.dd_sum(th, tl, axis=1)


@jax.jit
def solve(f: DDFactor, b):
    """A x = b with the DD factor; b is f64 [n] or [n, r] -> same shape.

    Blocked forward/backward substitution; the diagonal blocks apply the
    stored panel inverses, the off-diagonal strips are VPU DD products
    (r is small on the KKT path: <= 3 RHS, ref hdsdp_algo.c:1099-1101)."""
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    n, r = b.shape
    npad = f.lh.shape[0]
    block = f.wh.shape[1]
    npan = npad // block
    bh, bl = dd.from_f64(jnp.pad(b, ((0, npad - n), (0, 0))))
    rows = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)[:, 0]

    def fwd(k, st):
        rh, rl, yh, yl = st
        kb = k * block
        rkh = jax.lax.dynamic_slice(rh, (kb, 0), (block, r))
        rkl = jax.lax.dynamic_slice(rl, (kb, 0), (block, r))
        wh = jax.lax.dynamic_index_in_dim(f.wh, k, 0, keepdims=False)
        wl = jax.lax.dynamic_index_in_dim(f.wl, k, 0, keepdims=False)
        ykh, ykl = _block_matvec_dd(wh, wl, rkh, rkl)
        yh = jax.lax.dynamic_update_slice(yh, ykh, (kb, 0))
        yl = jax.lax.dynamic_update_slice(yl, ykl, (kb, 0))
        sth = jax.lax.dynamic_slice(f.lh, (0, kb), (npad, block))
        stl = jax.lax.dynamic_slice(f.ll, (0, kb), (npad, block))
        below = (rows >= kb + block)[:, None]
        sth = jnp.where(below, sth, 0.0)
        stl = jnp.where(below, stl, 0.0)
        dh, dl = dd.mul(sth[:, :, None], stl[:, :, None], ykh[None], ykl[None])
        dh, dl = dd.dd_sum(dh, dl, axis=1)
        rh, rl = dd.sub(rh, rl, dh, dl)
        return rh, rl, yh, yl

    z = jnp.zeros_like(bh)
    _, _, yh, yl = jax.lax.fori_loop(0, npan, fwd, (bh, bl, z, z))

    def bwd(i, st):
        rh, rl, xh, xl = st
        k = npan - 1 - i
        kb = k * block
        rkh = jax.lax.dynamic_slice(rh, (kb, 0), (block, r))
        rkl = jax.lax.dynamic_slice(rl, (kb, 0), (block, r))
        wh = jax.lax.dynamic_index_in_dim(f.wh, k, 0, keepdims=False)
        wl = jax.lax.dynamic_index_in_dim(f.wl, k, 0, keepdims=False)
        xkh, xkl = _block_matvec_dd(
            jnp.swapaxes(wh, 0, 1), jnp.swapaxes(wl, 0, 1), rkh, rkl
        )
        xh = jax.lax.dynamic_update_slice(xh, xkh, (kb, 0))
        xl = jax.lax.dynamic_update_slice(xl, xkl, (kb, 0))
        # subtract L[kb:kb+B, :kb]^T @ x_k from rows < kb
        sth = jax.lax.dynamic_slice(f.lh, (kb, 0), (block, npad))
        stl = jax.lax.dynamic_slice(f.ll, (kb, 0), (block, npad))
        left = (rows < kb)[None, :]
        sth = jnp.where(left, sth, 0.0)
        stl = jnp.where(left, stl, 0.0)
        dh, dl = dd.mul(
            jnp.swapaxes(sth, 0, 1)[:, :, None],
            jnp.swapaxes(stl, 0, 1)[:, :, None],
            xkh[None],
            xkl[None],
        )
        dh, dl = dd.dd_sum(dh, dl, axis=1)
        rh, rl = dd.sub(rh, rl, dh, dl)
        return rh, rl, xh, xl

    _, _, xh, xl = jax.lax.fori_loop(0, npan, bwd, (yh, yl, z, z))
    x = dd.to_f64(xh, xl)[:n]
    return x[:, 0] if vec else x


@jax.jit
def tri_inverse(f: DDFactor):
    """G = L^{-1} as a DD pair [np, np] (blocked forward substitution on I,
    strips via MXU hpmm; ref dpotri path hdsdp_linsolver.c:1238-1260)."""
    npad = f.lh.shape[0]
    block = f.wh.shape[1]
    npan = npad // block
    rows = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)[:, 0]
    eye = jnp.eye(npad, dtype=jnp.float32)

    def step(k, st):
        rh, rl, gh, gl = st
        kb = k * block
        rkh = jax.lax.dynamic_slice(rh, (kb, 0), (block, npad))
        rkl = jax.lax.dynamic_slice(rl, (kb, 0), (block, npad))
        wh = jax.lax.dynamic_index_in_dim(f.wh, k, 0, keepdims=False)
        wl = jax.lax.dynamic_index_in_dim(f.wl, k, 0, keepdims=False)
        gkh, gkl = hpmm.hpmm_dd(wh, wl, rkh, rkl)
        gh = jax.lax.dynamic_update_slice(gh, gkh, (kb, 0))
        gl = jax.lax.dynamic_update_slice(gl, gkl, (kb, 0))
        sth = jax.lax.dynamic_slice(f.lh, (0, kb), (npad, block))
        stl = jax.lax.dynamic_slice(f.ll, (0, kb), (npad, block))
        below = (rows >= kb + block)[:, None]
        sth = jnp.where(below, sth, 0.0)
        stl = jnp.where(below, stl, 0.0)
        dh, dl = hpmm.hpmm_dd(sth, stl, gkh, gkl)
        rh, rl = dd.sub(rh, rl, dh, dl)
        return rh, rl, gh, gl

    z = jnp.zeros_like(f.lh)
    _, _, gh, gl = jax.lax.fori_loop(0, npan, step, (eye, z, z, z))
    return gh, gl


def spd_inverse(f: DDFactor, n: int):
    """A^{-1} = G^T G in f64, sliced to the original size."""
    gh, gl = tri_inverse(f)
    ch, cl = hpmm.hpmm_dd(
        jnp.swapaxes(gh, 0, 1), jnp.swapaxes(gl, 0, 1), gh, gl
    )
    return dd.to_f64(ch, cl)[:n, :n]


def factor_from_f64_tri(L, block=256) -> DDFactor:
    """Wrap an EXISTING f64 lower-triangular factor as a DDFactor.

    The panel diagonal-block inverses (the W arrays) are computed by
    small batched f64 trisolves — O(n B^2) flops, negligible — so the
    MXU strip kernels (tri_inverse / spd_inverse / solve) can run
    against a factor that was produced elsewhere (e.g. the f64 L the
    cone system already carries)."""
    import jax.scipy.linalg as jsl

    n = L.shape[0]
    Lp = _pad_spd(L, block)
    npad = Lp.shape[0]
    npan = npad // block
    lh, ll = dd.from_f64(Lp)
    ks = jnp.arange(npan)
    blocks = jax.vmap(
        lambda k: jax.lax.dynamic_slice(
            Lp, (k * block, k * block), (block, block)
        )
    )(ks)
    eye = jnp.eye(block, dtype=L.dtype)
    W = jax.vmap(lambda B_: jsl.solve_triangular(B_, eye, lower=True))(blocks)
    wh, wl = dd.from_f64(W)
    return DDFactor(lh, ll, wh, wl)


@partial(jax.jit, static_argnames=("block",))
def spd_inverse_from_f64_tri(L, block=256):
    """A^{-1} = L^{-T} L^{-1} from an f64 lower factor, MXU strips.

    Replaces the emulated-f64 trisolve-on-identity + einsum
    (ops.chol.chol_inverse ~ dpotri, ref hdsdp_linsolver.c:1238-1260)
    with the DD blocked inverse — the per-iteration U = S^-1 of the KKT
    build at large single blocks."""
    f = factor_from_f64_tri(L, block=block)
    return spd_inverse(f, L.shape[0])


def chol_f64(a, block=256):
    """Convenience: f64 lower Cholesky factor via the DD path."""
    f = factor(a, block=block)
    n = a.shape[0]
    return dd.to_f64(f.lh, f.ll)[:n, :n]
