"""Synthetic SDP instance generator.

Produces random primal-dual strictly feasible problems in the same raw COO
form as the SDPA reader (hdsdp_tpu.io.sdpa.SDPAData), so benchmarks and the
multi-chip dry-run exercise the exact presolve + solve path used for real
files.  Feasibility construction: pick X0 ≻ 0 and (y0, S0 ≻ 0), set
b = A(X0) and C = S0 + A'y0; then both primal and dual are strictly
feasible, hence the problem is solvable with zero duality gap.

The constraint mix (rank-1 vs sparse vs dense coefficients) mirrors the
structures the reference classifies into its five coefficient types
(ref linalg/hdsdp_sdpdata.c:2321-2345).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from hdsdp_tpu.io.sdpa import BlockEntries, LPEntries, SDPAData


def _sym_coo(A: np.ndarray):
    """Lower-triangular COO of a symmetric dense matrix."""
    n = A.shape[0]
    il, jl = np.tril_indices(n)
    v = A[il, jl]
    keep = np.abs(v) > 0.0
    return il[keep].astype(np.int32), jl[keep].astype(np.int32), v[keep]


def random_sdpa(
    m: int = 32,
    block_dims: Optional[List[int]] = None,
    n_lp: int = 0,
    rank1_frac: float = 0.5,
    density: float = 0.3,
    seed: int = 0,
) -> SDPAData:
    """Generate a strictly feasible random SDP in raw SDPA COO form."""

    if block_dims is None:
        block_dims = [16, 16]
    rng = np.random.default_rng(seed)
    nblk = len(block_dims)

    # per-block dense coefficient stacks A[i] (i = 1..m) and C
    A_blocks = []
    for n in block_dims:
        A = np.zeros((m, n, n))
        for i in range(m):
            if rng.random() < rank1_frac:
                v = rng.normal(size=n)
                v[rng.random(n) > density] = 0.0
                if not np.any(v):
                    v[rng.integers(n)] = 1.0
                A[i] = np.sign(rng.normal()) * np.outer(v, v)
            else:
                B = rng.normal(size=(n, n))
                mask = rng.random((n, n)) < density
                B = B * mask
                A[i] = 0.5 * (B + B.T)
        A_blocks.append(A)

    A_lp = rng.normal(size=(m, n_lp)) if n_lp else np.zeros((m, 0))

    # strictly feasible primal X0 and dual (y0, S0)
    y0 = rng.normal(size=m) * 0.1
    b = np.zeros(m)
    C_blocks = []
    for n, A in zip(block_dims, A_blocks):
        G = rng.normal(size=(n, n)) / np.sqrt(n)
        X0 = G @ G.T + 0.5 * np.eye(n)
        b += np.einsum("ipq,pq->i", A, X0)
        H = rng.normal(size=(n, n)) / np.sqrt(n)
        S0 = H @ H.T + 0.5 * np.eye(n)
        C_blocks.append(S0 + np.einsum("i,ipq->pq", y0, A))
    if n_lp:
        x0 = 0.5 + rng.random(n_lp)
        b += A_lp @ x0
        s0 = 0.5 + rng.random(n_lp)
        c_lp = s0 + A_lp.T @ y0
    else:
        c_lp = np.zeros(0)

    data = SDPAData(m=m, block_dims=list(block_dims), b=b)
    nnz = 0
    for n, A, C in zip(block_dims, A_blocks, C_blocks):
        cons, rows, cols, vals = [], [], [], []
        # objective enters negated in the file; the reader negates it back.
        # Here we build reader-output COO directly: con 0 holds C as solved.
        r, c, v = _sym_coo(C)
        cons.append(np.zeros(len(v), np.int32))
        rows.append(r)
        cols.append(c)
        vals.append(v)
        for i in range(m):
            r, c, v = _sym_coo(A[i])
            cons.append(np.full(len(v), i + 1, np.int32))
            rows.append(r)
            cols.append(c)
            vals.append(v)
        blk = BlockEntries(
            dim=n,
            con=np.concatenate(cons),
            row=np.concatenate(rows),
            col=np.concatenate(cols),
            val=np.concatenate(vals),
        )
        nnz += len(blk.val)
        data.blocks.append(blk)

    if n_lp:
        con_idx = []
        var_idx = []
        val_l = []
        for i in range(n_lp):
            con_idx.append(0)
            var_idx.append(i)
            val_l.append(c_lp[i])
        for i in range(m):
            for j in range(n_lp):
                con_idx.append(i + 1)
                var_idx.append(j)
                val_l.append(A_lp[i, j])
        data.lp = LPEntries(
            ncols=n_lp,
            con=np.asarray(con_idx, np.int32),
            var=np.asarray(var_idx, np.int32),
            val=np.asarray(val_l),
        )
        nnz += len(val_l)

    data.nnz = nnz
    return data
