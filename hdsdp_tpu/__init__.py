"""hdsdp_tpu: a TPU-native homogeneous dual-scaling interior-point SDP solver.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of HDSDP
(reference: /root/reference, interface/hdsdp.h:108-120):

  min <C, X>  s.t.  A(X) = b,  X in (product of SDP / LP / bound cones)

solved by a three-phase dual interior-point method:

  Phase A  infeasible-start dual IPM        (ref interface/hdsdp_algo.c:960)
  Phase A' homogeneous self-dual embedding  (ref interface/hdsdp_algo.c:355)
  Phase B  dual potential reduction         (ref interface/hdsdp_algo.c:1658)

Design notes (TPU-first, NOT a port):
  * The reference dispatches five per-row Schur strategies (M1-M5) over five
    coefficient-matrix types through C vtables.  Here every coefficient matrix
    is eigen-decomposed once at presolve (restricted to its sparsity support,
    the SPEIGS trick) and constraints are bucketed into a *low-rank* bucket
    (factors F:[R,n], weights lam:[R]) and a *dense* bucket ([md,n,n]).  The
    Schur complement M_ij = tr(A_i S^-1 A_j S^-1) then becomes a handful of
    large batched contractions that map directly onto the MXU.
  * Dual matrices S are kept masked-dense per block; blocks of equal dimension
    are batched; Cholesky/eigh are batched XLA ops.
  * Multi-chip scaling shards constraint rows of M and cone blocks over a
    jax.sharding.Mesh (see hdsdp_tpu.parallel).
"""

import os

import jax

# Honor JAX_PLATFORMS even when an out-of-tree platform plugin would
# otherwise take priority: the env var can lose to plugin registration
# order, the config update cannot (same guard as __main__ and the test
# conftest — without it "JAX_PLATFORMS=cpu python ..." still runs on TPU).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# The interior-point method uses Cholesky success/failure as a PSD predicate
# and drives duality gaps to 1e-8: double precision is required, exactly as
# the reference is double-only (ref CMakeLists.txt: ANSI C + BLAS/LAPACK).
jax.config.update("jax_enable_x64", True)

from hdsdp_tpu.io.sdpa import read_sdpa  # noqa: E402
from hdsdp_tpu.models.problem import SDPProblem  # noqa: E402
from hdsdp_tpu.solver.batch import solve_batch  # noqa: E402
from hdsdp_tpu.solver.solver import HDSDPSolver, solve_sdpa_file  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "read_sdpa",
    "SDPProblem",
    "HDSDPSolver",
    "solve_batch",
    "solve_sdpa_file",
]
