"""Row-sharded preconditioned CG over a device mesh.

For m large enough that the m x m Schur factorization dominates, the
KKT solve distributes: M's rows are sharded over the mesh axis, each
device computes its slice of the matvec, and an ``all_gather`` over ICI
reassembles the direction vector.  Scalar reductions ride the replicated
vectors, so the only per-iteration communication is the one gather.
(SURVEY.md section 5: the distributed-communication design the reference
lacks.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def sharded_pcg(
    mesh: Mesh,
    M: jnp.ndarray,
    rhs: jnp.ndarray,
    max_iter: int = 200,
    abs_tol: float = 1e-08,
    rel_tol: float = 1e-08,
):
    """Solve M x = rhs with Jacobi-PCG, M row-sharded over the mesh.

    Returns (x, iters).  M is padded internally to a multiple of the mesh
    size with an identity diagonal (padding rows solve trivially to 0).
    """
    axis = mesh.axis_names[0]
    ndev = int(np.prod(mesh.devices.shape))
    m = M.shape[0]
    mp = -(-m // ndev) * ndev
    if mp != m:
        pad = mp - m
        M = jnp.pad(M, ((0, pad), (0, pad))) + jnp.diag(
            jnp.concatenate([jnp.zeros(m, M.dtype), jnp.ones(pad, M.dtype)])
        )
        rhs = jnp.pad(rhs, (0, pad))

    diag = jnp.diag(M)

    def body(M_loc, rhs_full, diag_full):
        def matvec(v):
            y_loc = M_loc @ v
            return jax.lax.all_gather(y_loc, axis, tiled=True)

        rhs_norm = jnp.linalg.norm(rhs_full)
        tol = jnp.maximum(
            jnp.minimum(abs_tol, rhs_norm * rel_tol), 0.1 * abs_tol
        )

        x0 = jnp.zeros_like(rhs_full)
        r0 = rhs_full
        z0 = r0 / diag_full
        d0 = z0
        Md0 = matvec(d0)

        def cond(c):
            x, r, d, z, Md, it, done = c
            return jnp.logical_not(done)

        def step(c):
            x, r, d, z, Md, it, done = c
            rz = z @ r
            alpha = rz / (d @ Md)
            x = x + alpha * d
            r = r - alpha * Md
            z = r / diag_full
            beta = (r @ z) / rz
            d = z + beta * d
            Md = matvec(d)
            rn = jnp.linalg.norm(r)
            done = jnp.logical_or(rn < tol, it + 1 >= max_iter)
            done = jnp.logical_or(done, rn != rn)
            return x, r, d, z, Md, it + 1, done

        rn0 = jnp.linalg.norm(r0)
        out = jax.lax.while_loop(
            cond, step,
            (x0, r0, d0, z0, Md0, jnp.asarray(0, jnp.int32), rn0 < tol),
        )
        return out[0], out[5]

    try:
        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    except TypeError:  # older jax uses check_rep
        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
    x, iters = jax.jit(fn)(M, rhs, diag)
    return x[:m], iters
