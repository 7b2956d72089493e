"""Hardware platform detection for precision-mode auto-selection.

The MXU-based backends (DD Cholesky, Ozaki-slice matmul, mixed-precision
Schur solves) pay off only where f64 is emulated and matmul units are
fast — i.e. on TPU.  TPU devices do not always report ``platform ==
"tpu"``: out-of-tree PJRT plugins (e.g. the axon tunnel used on
single-chip dev machines) register their own platform name and only
alias it to "tpu" for MLIR lowering, so a strict string compare
silently disables every TPU fast path.
"""

from __future__ import annotations

import jax

# Platform names that are TPU hardware behind a plugin alias.
_TPU_PLATFORMS = frozenset({"tpu", "axon"})


def is_tpu() -> bool:
    """True iff the default JAX backend executes on TPU hardware."""
    try:
        d = jax.devices()[0]
    except Exception:  # pragma: no cover - no devices during AOT tracing
        return False
    if d.platform in _TPU_PLATFORMS:
        return True
    # device_kind is the hardware model string (e.g. "TPU v5e") and is
    # stable across plugin platform renames.
    return "tpu" in (getattr(d, "device_kind", "") or "").lower()
