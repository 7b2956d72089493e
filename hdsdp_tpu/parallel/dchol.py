"""Distributed blocked Cholesky of the row-sharded Schur complement.

The reference factors the m x m Schur matrix with a single-node LAPACK
dpotrf (ref linalg/hdsdp_linsolver.c:1044-1286).  Here M's rows are
sharded over the 1-D mesh axis and the factorization is a right-looking
blocked algorithm where the only communication per panel is

  * one ``psum`` broadcasting the B x B diagonal block to all devices
    (every device then factors it redundantly — O(B^3) is negligible),
  * one tiled ``all_gather`` of the panel column [m, B] for the trailing
    update.

Total communication is O(m^2) — the same order as gathering M once — and
no device ever materializes the full matrix.  The triangular solves run
panel-by-panel with one small ``psum`` per panel (the SURVEY section 5/7
"fan-in panel updates" design).

All shapes are static: m is padded to a multiple of ndev * block with an
identity diagonal so panels never straddle devices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _shmap(body, mesh, in_specs, out_specs):
    try:
        return shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # older jax uses check_rep
        return shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def _padded_size(m: int, ndev: int, block: int) -> int:
    unit = ndev * block
    return max(-(-m // unit) * unit, unit)


def pad_spd(M: jnp.ndarray, mp: int) -> jnp.ndarray:
    """Pad an SPD matrix to [mp, mp] with an identity tail block."""
    m = M.shape[0]
    if mp == m:
        return M
    pad = mp - m
    Mp = jnp.pad(M, ((0, pad), (0, pad)))
    tail = jnp.concatenate([jnp.zeros(m, M.dtype), jnp.ones(pad, M.dtype)])
    return Mp + jnp.diag(tail)


class ShardedCholFactor:
    """Opaque handle: row-sharded L plus layout metadata."""

    def __init__(self, L, ok, m, mp, mesh, block):
        self.L = L  # [mp, mp] row-sharded (NamedSharding P(axis, None))
        self.ok = ok
        self.m = m
        self.mp = mp
        self.mesh = mesh
        self.block = block


def _factor_body(axis: str, ndev: int, block: int, mp: int, M_loc):
    """Per-device body: M_loc [mloc, mp] -> (L_loc, ok)."""
    B = block
    mloc = mp // ndev
    ppd = mloc // B  # panels per device
    npanels = mp // B
    idx = jax.lax.axis_index(axis)
    grow = idx * mloc + jnp.arange(mloc)  # global row ids of local rows

    def panel_step(p, carry):
        A_loc, L_loc = carry
        col = p * B
        owner = p // ppd
        rid = (p % ppd) * B  # local row offset of the panel on its owner
        is_owner = (idx == owner)

        Dblk_loc = jax.lax.dynamic_slice(A_loc, (rid, col), (B, B))
        Dblk = jax.lax.psum(
            jnp.where(is_owner, Dblk_loc, jnp.zeros_like(Dblk_loc)), axis
        )
        Lp = jnp.linalg.cholesky(Dblk)  # redundant on every device
        Lp_invT = solve_triangular(
            Lp, jnp.eye(B, dtype=A_loc.dtype), lower=True
        ).T

        Acol = jax.lax.dynamic_slice(A_loc, (0, col), (mloc, B))
        G_loc = Acol @ Lp_invT  # candidate panel column for local rows
        below = (grow >= col + B)[:, None]
        G_below = jnp.where(below, G_loc, 0.0)

        # owner's panel rows hold Lp itself
        P_loc = jax.lax.dynamic_update_slice(
            jnp.zeros((mloc, B), A_loc.dtype), Lp, (rid, 0)
        )
        P_loc = jnp.where(is_owner, P_loc, jnp.zeros_like(P_loc))
        L_loc = jax.lax.dynamic_update_slice(L_loc, G_below + P_loc, (0, col))

        # trailing update: gathered panel column is zero in/above the
        # panel, so the full-width matmul only touches the trailing block
        G_full = jax.lax.all_gather(G_below, axis, tiled=True)  # [mp, B]
        A_loc = A_loc - G_below @ G_full.T
        return A_loc, L_loc

    L0 = jnp.zeros_like(M_loc)
    _, L_loc = jax.lax.fori_loop(0, npanels, panel_step, (M_loc, L0))
    # NaN predicate (arithmetic form, see ops.chol.chol_ok)
    ok_loc = jnp.sum(L_loc - L_loc) == 0.0
    ok = jax.lax.psum(ok_loc.astype(jnp.int32), axis) == ndev
    return L_loc, ok


def _solve_body(axis: str, ndev: int, block: int, mp: int, L_loc, b):
    """Solve L L^T x = b with row-sharded L; b, x replicated [mp, k]."""
    B = block
    mloc = mp // ndev
    ppd = mloc // B
    npanels = mp // B
    idx = jax.lax.axis_index(axis)
    grow = idx * mloc + jnp.arange(mloc)
    k = b.shape[1]

    def fwd(p, x):
        col = p * B
        owner = p // ppd
        rid = (p % ppd) * B
        is_owner = (idx == owner)
        # t = L[panel rows, :col] @ x  (x is zero at/after col)
        rows_block = jax.lax.dynamic_slice(L_loc, (rid, 0), (B, mp))
        colmask = (jnp.arange(mp) < col)[:, None]
        t = rows_block @ jnp.where(colmask, x, 0.0)
        Lp = jax.lax.dynamic_slice(L_loc, (rid, col), (B, B))
        b_blk = jax.lax.dynamic_slice(b, (col, 0), (B, k))
        xp = solve_triangular(Lp, b_blk - t, lower=True)
        xp = jax.lax.psum(
            jnp.where(is_owner, xp, jnp.zeros_like(xp)), axis
        )
        return jax.lax.dynamic_update_slice(x, xp, (col, 0))

    y = jax.lax.fori_loop(0, npanels, fwd, jnp.zeros_like(b))

    def bwd(q, x):
        p = npanels - 1 - q
        col = p * B
        owner = p // ppd
        rid = (p % ppd) * B
        is_owner = (idx == owner)
        # t = sum_{r > col+B-1} L[r, col:col+B]^T x[r]  (x known there)
        Lcols = jax.lax.dynamic_slice(L_loc, (0, col), (mloc, B))
        rmask = (grow >= col + B)[:, None]
        x_loc = jax.lax.dynamic_slice_in_dim(x, idx * mloc, mloc, 0)
        t = jax.lax.psum(jnp.where(rmask, Lcols, 0.0).T @ x_loc, axis)
        Lp = jax.lax.dynamic_slice(L_loc, (rid, col), (B, B))
        Lp = jax.lax.psum(
            jnp.where(is_owner, Lp, jnp.zeros_like(Lp)), axis
        )
        y_blk = jax.lax.dynamic_slice(x, (col, 0), (B, k))
        xp = solve_triangular(Lp, y_blk - t, lower=True, trans=1)
        return jax.lax.dynamic_update_slice(x, xp, (col, 0))

    x = jax.lax.fori_loop(0, npanels, bwd, y)
    return x


@partial(jax.jit, static_argnames=("mesh", "block"))
def _factor_jit(mesh, block, Mp):
    axis = mesh.axis_names[0]
    ndev = int(np.prod(mesh.devices.shape))
    mp = Mp.shape[0]
    body = partial(_factor_body, axis, ndev, block, mp)
    return _shmap(body, mesh, (P(axis, None),), (P(axis, None), P()))(Mp)


@partial(jax.jit, static_argnames=("mesh", "block"))
def _solve_jit(mesh, block, L, b):
    axis = mesh.axis_names[0]
    ndev = int(np.prod(mesh.devices.shape))
    mp = L.shape[0]
    body = partial(_solve_body, axis, ndev, block, mp)
    return _shmap(body, mesh, (P(axis, None), P()), P())(L, b)


def sharded_cholesky(mesh: Mesh, M: jnp.ndarray, block: int = 128) -> ShardedCholFactor:
    """Factor an SPD matrix with rows sharded over the mesh.

    ``ok`` is False (NaN-propagated) if M is not positive definite —
    the same predicate semantics as HFpLinsysPsdCheck
    (ref hdsdp_linsolver.c:1112-1144).
    """
    ndev = int(np.prod(mesh.devices.shape))
    m = M.shape[0]
    block = min(block, max(8, m))
    mp = _padded_size(m, ndev, block)
    Mp = pad_spd(M, mp)
    axis = mesh.axis_names[0]
    Mp = jax.device_put(Mp, NamedSharding(mesh, P(axis, None)))
    L, ok = _factor_jit(mesh, block, Mp)
    return ShardedCholFactor(L, ok, m, mp, mesh, block)


def sharded_chol_solve(fac: ShardedCholFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = rhs (rhs [m] or [m, k]) against a sharded factor."""
    single = rhs.ndim == 1
    b = rhs[:, None] if single else rhs
    pad = fac.mp - fac.m
    if pad:
        b = jnp.pad(b, ((0, pad), (0, 0)))
    x = _solve_jit(fac.mesh, fac.block, fac.L, b)
    x = x[: fac.m]
    return x[:, 0] if single else x
