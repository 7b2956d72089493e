"""Roofline / MFU measurement for the two hot kernels.

Measures achieved Tflop/s of (a) the slot-major Schur assembly and
(b) the Schur-matrix factorization backends (XLA f64, DD Pallas, f32
mixed-precision) against the *measured* matmul ceiling of the chip in
the same precision, so the BASELINE.md ">= 70% of roofline" target is
an actual number instead of a claim.  TPU f64 is emulated, so the f64
"peak" is itself measured (a large checksummed f64 matmul), not quoted.

    python benchmarks/roofline.py [--sizes m:n,...]

Flop accounting (logical flops of the mathematical operation):
  slot-major assembly, rank r:  r * 2mn^2   (FU = Fs @ U)
                              + r(r+1)/2 * 2m^2n   (T = FU_j @ Fs_k^T)
                              + 3 * r(r+1)/2 * m^2 (hadamard + scale)
  cholesky(m):                  m^3/3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

# honor JAX_PLATFORMS=cpu: the axon TPU plugin registers regardless of
# the env var; only the config update beats plugin priority (NOTES.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=5):
    """Median wall time of a jitted call, checksummed against DCE.

    The checksum is fetched to HOST each rep: on the experimental axon
    TPU platform block_until_ready() returns before the device work
    completes (observed: 4096^3 bf16 "measured" at 1970 Tflop/s, 5x the
    v5e physical peak), so only a host read-back is a true barrier.
    The scalar transfer adds one RTT, amortized by timing reps together.
    """
    float(np.asarray(fn(*args)))  # compile + warm
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        acc += float(np.asarray(fn(*args)))
    t = (time.perf_counter() - t0) / reps
    del acc
    return t


def matmul_ceiling(dtype, k=4096, chain=8):
    """Measured matmul Tflop/s at size k — the per-precision roofline.

    `chain` dependent matmuls run inside ONE dispatch so the host RTT of
    the checksum fetch (see _time) is amortized; each iterate rescales
    to unit RMS to keep the values finite across the chain.
    """
    a = jnp.asarray(np.random.default_rng(0).normal(size=(k, k)), dtype)

    def body(x, _):
        y = x @ x
        y = y * (1.0 / jnp.sqrt(jnp.mean(jnp.square(y.astype(jnp.float32))))).astype(
            x.dtype
        )
        return y, ()

    f = jax.jit(lambda x: jnp.sum(jax.lax.scan(body, x, (), length=chain)[0]))
    t = _time(f, a, reps=3)
    return chain * 2 * k**3 / t / 1e12


def assembly_rate(m, n, r=2, hp=False):
    """Slot-major Schur assembly achieved Tflop/s (f64 or Ozaki-hp)."""
    from hdsdp_tpu.ops.schur import GroupArrays, group_schur

    rng = np.random.default_rng(1)
    Fs = jnp.asarray(rng.normal(size=(r, m, n)))
    lams = jnp.asarray(rng.normal(size=(r, m)))
    ga = GroupArrays(
        C=jnp.zeros((1, n, n)),
        F=jnp.zeros((1, 1, n)),
        lam=jnp.zeros((1, 1)),
        seg=jnp.zeros((1, 1), jnp.int32),
        Ad=jnp.zeros((0, n, n)),
        didx=jnp.zeros((0,), jnp.int32),
        dblk=jnp.zeros((0,), jnp.int32),
        Fs=Fs,
        lams=lams,
    )
    G = rng.normal(size=(n, n))
    U = jnp.asarray(G @ G.T + n * np.eye(n))[None]

    f = jax.jit(
        lambda u: jax.tree.reduce(
            lambda a, b: a + jnp.sum(b), group_schur(ga, u, m, hp=hp), 0.0
        )
    )
    t = _time(f, U)
    pairs = r * (r + 1) // 2
    flops = r * 2 * m * n * n + pairs * 2 * m * m * n + 3 * pairs * m * m
    return flops / t / 1e12, t


def chol_rates(m):
    """Achieved Tflop/s of the factorization backends at size m."""
    from hdsdp_tpu.ops import ddchol

    rng = np.random.default_rng(2)
    G = rng.normal(size=(m, m))
    Mat = jnp.asarray(G @ G.T + m * np.eye(m))
    flops = m**3 / 3

    out = {}
    f64 = jax.jit(lambda a: jnp.sum(jnp.linalg.cholesky(a)))
    t = _time(f64, Mat)
    out["xla_f64"] = (flops / t / 1e12, t)
    f32 = jax.jit(lambda a: jnp.sum(jnp.linalg.cholesky(a.astype(jnp.float32))))
    t = _time(f32, Mat)
    out["xla_f32"] = (flops / t / 1e12, t)
    try:
        dd = jax.jit(lambda a: jnp.sum(ddchol.factor(a).lh.astype(jnp.float64)))
        t = _time(dd, Mat)
        out["dd_chol"] = (flops / t / 1e12, t)
    except Exception as e:  # pallas path unavailable off-TPU
        out["dd_chol"] = (float("nan"), float("nan"))
        print(f"  (dd_chol skipped: {type(e).__name__})")
    # the full mp KKT factor as the solver runs it: equilibrate, f32
    # Cholesky, panel-invert the factor (TPU inverted-precond path)
    from hdsdp_tpu.ops.cg import _equilibrated_factor, use_inverted_precond

    inv = use_inverted_precond(m)
    mp = jax.jit(
        lambda a: jnp.sum(
            _equilibrated_factor(a, f32=True, inv=inv)[0].astype(jnp.float64)
        )
    )
    t = _time(mp, Mat)
    # inversion adds ~2/3 m^3 on top of the m^3/3 factor when engaged
    mp_flops = flops * (3.0 if inv else 1.0)
    out["mp_factor" + ("+inv" if inv else "")] = (mp_flops / t / 1e12, t)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024:512,2048:512,4096:512")
    ap.add_argument("--skip-assembly", action="store_true")
    ap.add_argument("--skip-chol", action="store_true")
    ap.add_argument("--skip-f64-assembly", action="store_true",
                    help="hp assembly only (the n=5000 f64 emulated-matmul "
                    "compile has killed the axon remote-compile pipe)")
    ap.add_argument("--ceiling-k", type=int, default=4096)
    args = ap.parse_args()

    k = args.ceiling_k
    print(f"measuring matmul ceilings ({k}^3)...")
    ceil = {
        "f64": matmul_ceiling(jnp.float64, k),
        "f32": matmul_ceiling(jnp.float32, k),
        "bf16": matmul_ceiling(jnp.bfloat16, k),
    }
    print(
        f"ceilings: f64 {ceil['f64']:.3f} / f32 {ceil['f32']:.2f} / "
        f"bf16 {ceil['bf16']:.1f} Tflop/s"
    )

    # every case is individually fallible: one broken compile (the axon
    # remote-compile pipe dies on very large f64 emulated programs) must
    # not lose the rest of the table
    if not args.skip_chol:
        for m in sorted({int(tok.split(":")[0]) for tok in args.sizes.split(",")}):
            try:
                rates = chol_rates(m)
            except Exception as e:
                print(f"  (cholesky m={m} skipped: {type(e).__name__})")
                continue
            for k, (rate, t) in rates.items():
                base = ceil["f32"] if "f32" in k or "dd" in k else ceil["f64"]
                print(
                    f"cholesky  m={m:5d} {k:9s}: {t*1e3:8.2f} ms "
                    f"{rate:7.3f} Tflop/s = {100*rate/base:5.1f}% of "
                    f"{'f32' if base == ceil['f32'] else 'f64'} ceiling"
                )

    if args.skip_assembly:
        return
    for tok in args.sizes.split(","):
        m, n = (int(x) for x in tok.split(":"))
        if not args.skip_f64_assembly:
            try:
                rate, t = assembly_rate(m, n)
                print(
                    f"assembly  m={m:5d} n={n:4d} r=2: {t*1e3:8.2f} ms "
                    f"{rate:7.3f} Tflop/s = {100*rate/ceil['f64']:5.1f}% of "
                    f"f64 ceiling"
                )
            except Exception as e:
                print(f"  (f64 assembly m={m} n={n} skipped: {type(e).__name__})")
        try:
            rate, t = assembly_rate(m, n, hp=True)
            print(
                f"assembly  m={m:5d} n={n:4d} r=2 hp: {t*1e3:6.2f} ms "
                f"{rate:7.3f} Tflop/s = {100*rate/ceil['f64']:5.1f}% of f64 "
                f"ceiling ({100*21*rate/ceil['bf16']:5.1f}% of bf16 at 21x "
                f"slice passes)"
            )
        except Exception as e:
            print(f"  (hp assembly skipped: {type(e).__name__})")


if __name__ == "__main__":
    main()
