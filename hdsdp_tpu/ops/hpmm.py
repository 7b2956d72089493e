"""High-precision matmul on the MXU via mantissa slicing (Ozaki scheme).

The reference runs all factorizations/contractions in f64 BLAS
(ref linalg/vec_opts.c, dense_opts.c).  TPU has no native f64: XLA
emulates it on the VPU at ~0.02-0.6 Tflop/s, while the MXU runs bf16 at
~200 Tflop/s.  This module recovers ~48-bit-accurate matmuls from bf16
MXU passes:

  1. Scale each row of A (column of B) by a power of two so the row max
     lands in [0.5, 1).  Powers of two make the scaling exact.
  2. Slice each normalized value into q = 6 bf16 slices of 8 mantissa
     bits each: slice t holds bits [8t, 8t+8) below the row scale.
     Extraction uses the round-to-coarser-ulp trick s = (r + c) - c with
     c = 1.5 * 2^(15-8t), exact in f32 round-to-nearest.
  3. For each pair (t, u) with t+u <= gmax (default 5 -> 21 pairs), run
     a bf16 MXU matmul with f32 accumulation over K-chunks of 256.
     8-bit x 8-bit products have <= 16 significant bits and, within one
     256-chunk, all partial sums are integer multiples of the pair ulp
     below 2^24 -- so the f32 in-chunk accumulation is EXACT.
  4. Across chunks, pairs with t+u <= 3 are folded into a running
     double-single accumulator (ops.dd); pairs with t+u >= 4 are summed
     in f32 (their scale is <= 2^-32, so f32 noise lands below 2^-52).

Result: C = A @ B with relative error ~2^-45 -- comparable to the
double-single (hi, lo) arithmetic in ops.dd, and sufficient for the
1e-8 duality-gap targets (ref interface/hdsdp.c:407-410).

All entry points are jit-compatible; q/gmax are static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd

_CHUNK = 256  # K-chunk size for exact in-chunk f32 accumulation


def _exp_of(m):
    """Power-of-two exponent of positive m via f32 frexp.

    f64 frexp/ldexp don't lower on TPU (the x64 rewriter hits an
    unimplemented s64 bitcast), so the exponent is taken from the f32
    cast.  Clamping to the f32 normal range means inputs outside
    ~[1e-36, 1e36] get cruder normalization — matching the documented
    ops.dd operating range (and f64 wrappers rescale in f64 anyway)."""
    mf = jnp.clip(m, 2.0**-120, 2.0**120).astype(jnp.float32)
    _, e = jnp.frexp(mf)
    return e


def _pow2(e, dtype):
    """Exact 2^e for |e| <= 126, built in f32 then cast."""
    return jnp.ldexp(jnp.ones_like(e, jnp.float32), e).astype(dtype)


def _normalize_dd(h, l, axis):
    """Scale (h, l) by per-row/col powers of two so max |h| lands in
    ~[0.5, 1] (the f32-cast exponent may be off by one binade at the
    rounding boundary; the slice-exactness margins absorb that).

    Returns (nh, nl, scale); scale has the reduced axis kept at size 1.
    Zero rows are harmless (slices of zero).  NaN propagates
    (PSD-check predicate semantics)."""
    m = jnp.max(jnp.abs(h), axis=axis, keepdims=True)
    e = _exp_of(m)
    inv = _pow2(-e, h.dtype)
    scale = _pow2(e, h.dtype)
    return h * inv, l * inv, scale


def _slices(nh, nl, q):
    """Extract q bf16 slices of 8 bits each from normalized DD values.

    Slice t holds bits [8t, 8t+8) below the unit scale; |slice t| <= 2^-8t
    and each value has <= 9 significant bits (exactly representable in
    bf16 because the widest case is a power of two)."""
    out = []
    rh, rl = nh, nl
    for t in range(q):
        # Truncate rh to a multiple of 2^-8(t+1).  NOT the classic
        # (r + c) - c rounding trick: XLA's algebraic simplifier folds
        # that to r under jit (constant reassociation).  trunc survives
        # every backend, and scaling by powers of two is exact.
        up = jnp.asarray(2.0 ** (8 * (t + 1)), rh.dtype)
        down = jnp.asarray(2.0 ** (-8 * (t + 1)), rh.dtype)
        s = jnp.trunc(rh * up) * down
        out.append(s.astype(jnp.bfloat16))
        # r -= s: rh - s is exact (s matches rh's leading bits); full
        # two_sum renormalization pulls rl's bits into later slices.
        rh, rl = dd.two_sum(rh - s, rl)
    return jnp.stack(out)


def _pad_k(x, axis):
    k = x.shape[axis]
    pad = (-k) % _CHUNK
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x


@partial(jax.jit, static_argnames=("gmax",))
def _matmul_sliced(a_sl, b_sl, gmax):
    """Core pair-product accumulation.

    a_sl: [q, M, K] bf16, b_sl: [q, K, N] bf16 (K a multiple of _CHUNK).
    Returns (Ch, Cl) f32 in normalized units."""
    q, m_dim, k_dim = a_sl.shape
    n_dim = b_sl.shape[2]
    nc = k_dim // _CHUNK
    # [nc, q, M, 256] / [nc, q, 256, N] for the scan
    a_c = a_sl.reshape(q, m_dim, nc, _CHUNK).transpose(2, 0, 1, 3)
    b_c = b_sl.reshape(q, nc, _CHUNK, n_dim).transpose(1, 0, 2, 3)

    def body(carry, chunk):
        ch, cl = carry
        ac, bc = chunk
        high = None  # f32 accumulator for pairs with t+u >= 4
        for g in range(gmax + 1):
            for t in range(g + 1):
                u = g - t
                p = jax.lax.dot(
                    ac[t], bc[u], preferred_element_type=jnp.float32
                )
                if g <= 3:
                    s, e = dd.two_sum(ch, p)
                    ch, cl = dd.quick_two_sum(s, e + cl)
                else:
                    high = p if high is None else high + p
        if high is not None:
            s, e = dd.two_sum(ch, high)
            ch, cl = dd.quick_two_sum(s, e + cl)
        return (ch, cl), None

    zero = jnp.zeros((m_dim, n_dim), jnp.float32)
    (ch, cl), _ = jax.lax.scan(body, (zero, zero), (a_c, b_c))
    return ch, cl


def _use_pallas():
    """Tile with Pallas on real TPU; the XLA scan path is the CPU/test
    fallback (same numerics, validated against float128)."""
    from hdsdp_tpu.utils.platform import is_tpu

    return is_tpu()


_TM = 256  # output tile rows
_TN = 256  # output tile cols
_KC = 512  # K elements per grid step (2 exact 256-chunks)


def _mm_kernel_factory(gmax, kc):
    q = gmax + 1

    def kernel(a_ref, b_ref, ch_ref, cl_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            ch_ref[:] = jnp.zeros_like(ch_ref)
            cl_ref[:] = jnp.zeros_like(cl_ref)

        ch = ch_ref[:]
        cl = cl_ref[:]
        for c in range(kc // _CHUNK):
            lo, hi = c * _CHUNK, (c + 1) * _CHUNK
            high = None
            for g in range(gmax + 1):
                for t in range(g + 1):
                    u = g - t
                    p = jax.lax.dot(
                        a_ref[t, :, lo:hi],
                        b_ref[u, lo:hi, :],
                        preferred_element_type=jnp.float32,
                    )
                    if g <= 3:
                        s, e = dd.two_sum(ch, p)
                        ch, cl = dd.quick_two_sum(s, e + cl)
                    else:
                        high = p if high is None else high + p
            if high is not None:
                s, e = dd.two_sum(ch, high)
                ch, cl = dd.quick_two_sum(s, e + cl)
        ch_ref[:] = ch
        cl_ref[:] = cl

    return kernel


@partial(jax.jit, static_argnames=("gmax",))
def _matmul_sliced_pallas(a_sl, b_sl, gmax):
    """Tiled Pallas version of _matmul_sliced: the (hi, lo) accumulator
    tile stays VMEM-resident across the K grid walk, where the XLA scan
    spills its [M, N] carry to HBM every chunk (measured cliff: 90
    Tflop/s-bf16 at M=1024 -> 5% at M=2048)."""
    q, m_dim, k_dim = a_sl.shape
    n_dim = b_sl.shape[2]

    def pad_to(x, mult, axis):
        pad = (-x.shape[axis]) % mult
        if pad:
            w = [(0, 0)] * x.ndim
            w[axis] = (0, pad)
            x = jnp.pad(x, w)
        return x

    a_sl = pad_to(pad_to(a_sl, _TM, 1), _KC, 2)
    b_sl = pad_to(pad_to(b_sl, _KC, 1), _TN, 2)
    mp, kp = a_sl.shape[1], a_sl.shape[2]
    np_ = b_sl.shape[2]

    grid = (mp // _TM, np_ // _TN, kp // _KC)
    ch, cl = pl.pallas_call(
        _mm_kernel_factory(gmax, _KC),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (q, _TM, _KC),
                lambda i, j, k: (jnp.int32(0), i, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (q, _KC, _TN),
                lambda i, j, k: (jnp.int32(0), k, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (_TM, _TN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_TM, _TN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, np_), jnp.float32),
            jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (gmax + 1) * (gmax + 2) * mp * np_ * kp,
            bytes_accessed=2 * q * (mp * kp + kp * np_) + 8 * mp * np_,
            transcendentals=0,
        ),
    )(a_sl, b_sl)
    return ch[:m_dim, :n_dim], cl[:m_dim, :n_dim]


def _matmul_dispatch(a_sl, b_sl, gmax):
    if _use_pallas():
        return _matmul_sliced_pallas(a_sl, b_sl, gmax)
    return _matmul_sliced(a_sl, b_sl, gmax)


def hpmm_dd(ah, al, bh, bl, gmax=5):
    """(Ah+Al) @ (Bh+Bl) -> (Ch, Cl), all f32 double-single pairs.

    Callers must keep magnitudes within f32 range (see ops.dd caveats);
    the internal slicing is range-safe via power-of-two normalization."""
    nh, nl, sa = _normalize_dd(ah, al, axis=1)
    a_sl = _pad_k(_slices(nh, nl, gmax + 1), axis=2)
    nh, nl, sb = _normalize_dd(bh, bl, axis=0)
    b_sl = _pad_k(_slices(nh, nl, gmax + 1), axis=1)
    ch, cl = _matmul_dispatch(a_sl, b_sl, gmax)
    s = sa * sb  # [M,1]*[1,N] powers of two, exact
    return ch * s, cl * s


def hpmm_dd_syrk(ah, al, gmax=5):
    """(Ah+Al) @ (Ah+Al).T -> (Ch, Cl) with a single slice extraction."""
    nh, nl, sa = _normalize_dd(ah, al, axis=1)
    a_sl = _pad_k(_slices(nh, nl, gmax + 1), axis=2)
    b_sl = jnp.swapaxes(a_sl, 1, 2)
    ch, cl = _matmul_dispatch(a_sl, b_sl, gmax)
    s = sa * jnp.swapaxes(sa, 0, 1)
    return ch * s, cl * s


def hpmm(a, b, gmax=5):
    """f64 matmul via bf16 MXU slices: a [M,K] @ b [K,N] -> f64 [M,N].

    Keeps ~48 of f64's 52 mantissa bits; the rescale happens in f64 so
    inputs may use the full f64 exponent range."""
    return _hpmm_f64_impl(a, b, gmax)


@partial(jax.jit, static_argnames=("gmax",))
def _hpmm_f64_impl(a, b, gmax):
    ea = _exp_of(jnp.max(jnp.abs(a), axis=1, keepdims=True))
    an = a * _pow2(-ea, a.dtype)  # exact
    ah, al = dd.from_f64(an)
    a_sl = _pad_k(_slices(ah, al, gmax + 1), axis=2)

    eb = _exp_of(jnp.max(jnp.abs(b), axis=0, keepdims=True))
    bn = b * _pow2(-eb, b.dtype)
    bh, bl = dd.from_f64(bn)
    b_sl = _pad_k(_slices(bh, bl, gmax + 1), axis=1)

    ch, cl = _matmul_dispatch(a_sl, b_sl, gmax)
    c = ch.astype(a.dtype) + cl.astype(a.dtype)
    # rescale as a product of two in-f32-range factors (|e| <= 120 each)
    return c * _pow2(ea, a.dtype) * _pow2(eb, a.dtype)


def hpmm_slice_a(a, gmax=5):
    """Pre-slice the left operand of :func:`hpmm` for reuse across many
    products with the SAME a (iterative-refinement residuals: one
    factorization serves dozens of ``a @ X`` evaluations).  Returns
    (a_sl [q, M, Kpad] bf16, ea [M, 1] int32 row exponents).

    Memory: q * M * K bf16 = 12 bytes/element at q=6 — substantially
    below the [8, M, K] f32 operand expansion XLA's f64 dot emulation
    materializes per call (the torus-22 3.4 GB OOM allocation)."""
    ea = _exp_of(jnp.max(jnp.abs(a), axis=1, keepdims=True))
    an = a * _pow2(-ea, a.dtype)
    ah, al = dd.from_f64(an)
    a_sl = _pad_k(_slices(ah, al, gmax + 1), axis=2)
    return a_sl, ea


@partial(jax.jit, static_argnames=("gmax",))
def hpmm_presliced(a_sl, ea, b, gmax=5):
    """f64 (pre-sliced a) @ b, the per-product half of hpmm()."""
    eb = _exp_of(jnp.max(jnp.abs(b), axis=0, keepdims=True))
    bn = b * _pow2(-eb, b.dtype)
    bh, bl = dd.from_f64(bn)
    b_sl = _pad_k(_slices(bh, bl, gmax + 1), axis=1)
    kpad = a_sl.shape[2]
    if b_sl.shape[1] != kpad:  # K pad must match the pre-sliced operand
        b_sl = jnp.pad(b_sl, ((0, 0), (0, kpad - b_sl.shape[1]), (0, 0)))
    ch, cl = _matmul_dispatch(a_sl, b_sl, gmax)
    c = ch.astype(b.dtype) + cl.astype(b.dtype)
    return c * _pow2(ea, b.dtype) * _pow2(eb, b.dtype)


def hpmm_syrk(a, gmax=5):
    """f64 a @ a.T with a single slice extraction."""
    return _hpmm_syrk_impl(a, gmax)


@partial(jax.jit, static_argnames=("gmax",))
def _hpmm_syrk_impl(a, gmax):
    ea = _exp_of(jnp.max(jnp.abs(a), axis=1, keepdims=True))
    an = a * _pow2(-ea, a.dtype)
    ah, al = dd.from_f64(an)
    a_sl = _pad_k(_slices(ah, al, gmax + 1), axis=2)
    b_sl = jnp.swapaxes(a_sl, 1, 2)
    ch, cl = _matmul_dispatch(a_sl, b_sl, gmax)
    c = ch.astype(a.dtype) + cl.astype(a.dtype)
    sa = _pow2(ea, a.dtype)
    return c * sa * sa.T
