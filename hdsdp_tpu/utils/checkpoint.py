"""Checkpoint / resume of the IPM state.

The reference has no checkpointing (SURVEY.md section 5); its closest
feature is the dual warm start ``HDSDPSetDualStart`` (ref
interface/hdsdp.c:617-624).  Here the full restartable state — the dual
iterate (y, tau), residual Rd, barrier mu, perturbation, and both primal
solution makers — is saved as an .npz and can seed a new solve.
"""

from __future__ import annotations

import numpy as np

FORMAT_VERSION = 1


def save_checkpoint(path: str, ipm) -> None:
    """Serialize the restartable IPM state."""
    mk = ipm.maker_acc
    mk2 = ipm.maker_inacc
    np.savez(
        path,
        version=FORMAT_VERSION,
        m=ipm.m,
        y=np.asarray(ipm.y),
        tau=ipm.tau,
        rd=ipm.Rd,
        mu=ipm.mu,
        perturb=ipm.perturb,
        n_iter=ipm.n_iter,
        status=ipm.status,
        maker_acc_mu=mk.mu,
        maker_acc_y=np.asarray(mk.y) if mk.y is not None else np.zeros(0),
        maker_acc_dy=np.asarray(mk.dy) if mk.dy is not None else np.zeros(0),
        maker_inacc_mu=mk2.mu,
        maker_inacc_y=np.asarray(mk2.y) if mk2.y is not None else np.zeros(0),
        maker_inacc_dy=np.asarray(mk2.dy) if mk2.dy is not None else np.zeros(0),
    )


def load_checkpoint(path: str) -> dict:
    with np.load(path) as z:
        if int(z["version"]) != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']}")
        out = {k: z[k] for k in z.files}
    return out


def apply_checkpoint(ipm, ckpt: dict) -> None:
    """Seed a DualIPM with a saved state (dual warm start + makers)."""
    from hdsdp_tpu.solver.algo import Maker

    if int(ckpt["m"]) != ipm.m:
        raise ValueError(
            f"checkpoint is for m={int(ckpt['m'])}, problem has m={ipm.m}"
        )
    import jax.numpy as jnp

    ipm.y0 = jnp.asarray(ckpt["y"], ipm.dtype)
    if ckpt["maker_acc_y"].size:
        ipm.maker_acc = Maker(
            mu=float(ckpt["maker_acc_mu"]),
            y=jnp.asarray(ckpt["maker_acc_y"], ipm.dtype),
            dy=jnp.asarray(ckpt["maker_acc_dy"], ipm.dtype),
        )
    if ckpt["maker_inacc_y"].size:
        ipm.maker_inacc = Maker(
            mu=float(ckpt["maker_inacc_mu"]),
            y=jnp.asarray(ckpt["maker_inacc_y"], ipm.dtype),
            dy=jnp.asarray(ckpt["maker_inacc_dy"], ipm.dtype),
        )
