"""Double-single ("DD") arithmetic: unevaluated pairs of f32 arrays.

A value x is represented as (hi, lo) with x = hi + lo and |lo| <= ulp(hi)/2,
giving ~48 mantissa bits at f32 speed.  TPU has no native f64: XLA emulates
it at ~0.02 Tflop/s inside sequential decompositions (measured: Cholesky
n=512 -> 43 ms), while the VPU runs f32 at ~6 Tflop/s inside Pallas kernels.
These primitives implement error-free transformations WITHOUT fused
multiply-add (TPU VPU exposes none through Pallas), using Dekker's splitting
(two_prod) and Knuth's two_sum, so they are exact in round-to-nearest f32.

All functions are shape-polymorphic jnp expressions: usable inside Pallas
kernels and in plain XLA.  Reference: the solver semantics these back are
the reference's f64 LAPACK factorizations (ref linalg/hdsdp_linsolver.c);
~48 bits suffice for the 1e-8 duality-gap targets (ref hdsdp.c:407-410).

Caveats (documented, accepted):
  * f32 exponent range: callers must pre-scale so magnitudes stay within
    ~1e-30..1e30 (dd_chol pre-scales by a power of two).
  * Dekker split multiplies by 4097: inputs above ~8e34 overflow.
"""

from __future__ import annotations

import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1 (f32: 24-bit mantissa -> 12/12 split)


def two_sum(a, b):
    """s + e == a + b exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    return s, b - (s - a)


def split(a):
    """a == hi + lo with hi, lo having <= 12 mantissa bits."""
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly (Dekker, FMA-free)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(xh, xl, yh, yl):
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return quick_two_sum(s, e)


def sub(xh, xl, yh, yl):
    return add(xh, xl, -yh, -yl)


def mul(xh, xl, yh, yl):
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(p, e)


def scale(xh, xl, c):
    """Multiply by an exact f32 scalar (e.g. a power of two)."""
    p, e = two_prod(xh, c)
    e = e + xl * c
    return quick_two_sum(p, e)


def fma(xh, xl, yh, yl, ah, al):
    """x * y + a in DD."""
    ph, pl = mul(xh, xl, yh, yl)
    return add(ph, pl, ah, al)


def div(xh, xl, yh, yl):
    """Two-step Newton quotient, ~full DD accuracy."""
    q1 = xh / yh
    ph, pl = mul(q1, jnp.zeros_like(q1), yh, yl)
    rh, rl = add(xh, xl, -ph, -pl)
    q2 = (rh + rl) / yh
    return quick_two_sum(q1, q2)


def inv(yh, yl):
    one = jnp.ones_like(yh)
    zero = jnp.zeros_like(yh)
    return div(one, zero, yh, yl)


def sqrt(xh, xl):
    """One DD Newton refinement of the f32 sqrt.

    sqrt(negative) yields NaN in the hi word, which propagates through all
    DD ops — preserving the try-Cholesky PSD-check predicate semantics
    (ref hdsdp_linsolver.c:1112-1144; see ops.chol.chol_ok)."""
    s = jnp.sqrt(xh)
    ph, pl = two_prod(s, s)
    rh, rl = add(xh, xl, -ph, -pl)
    # guard s == 0 (zero diagonal -> NaN, like LAPACK's info > 0)
    r = (rh + rl) / (2.0 * s)
    return quick_two_sum(s, r)


def dd_sum(h, l, axis):
    """Sum a DD array along ``axis`` with a binary two_sum tree.

    A plain f32 jnp.sum would cap accuracy at ~K*2^-24; the tree keeps
    the compensation term, staying at DD (~2^-45) level."""
    n = h.shape[axis]
    h = jnp.moveaxis(h, axis, 0)
    l = jnp.moveaxis(l, axis, 0)
    # pad leading axis to a power of two with zeros
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = [(0, p - n)] + [(0, 0)] * (h.ndim - 1)
        h, l = jnp.pad(h, pad), jnp.pad(l, pad)
    while p > 1:
        p //= 2
        ah, al, bh, bl = h[:p], l[:p], h[p:], l[p:]
        s, e = two_sum(ah, bh)
        h, l = quick_two_sum(s, e + al + bl)
    return h[0], l[0]


def from_f64(x):
    """Exact f64 -> DD (f64 has 52 mantissa bits; DD keeps the top ~48)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)
