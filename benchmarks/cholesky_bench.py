"""Device benchmark: Pallas blocked Cholesky vs XLA at BO support sizes.

VERDICT r1 item 5: the kernel (ops/pallas/cholesky.py) was written for
the 512+-support BO regime (bo_utils.py; GPyTorch Cholesky under
fs_mol/utils/gp_utils.py:7-49) but never measured on device. This prints
per-size forward (and optional grad) times for both routes with the
honest device->host sync (CLAUDE.md: block_until_ready lies through the
tunnel).

Usage: python benchmarks/cholesky_bench.py [--sizes 256,512,1024,2048]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from adkf_ift_tpu.ops.pallas.cholesky import blocked_cholesky


def timed(fn, *args, reps=10):
    out = fn(*args)
    float(np.sum(np.asarray(out)))  # compile + honest sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(np.sum(np.asarray(out)))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="256,512,1024,2048")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--grad", action="store_true")
    args = ap.parse_args()

    rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        rng = np.random.RandomState(0)
        b = rng.randn(n, n).astype(np.float32) / np.sqrt(n)
        a = jnp.asarray(b @ b.T + 1e-2 * np.eye(n, dtype=np.float32))

        xla = jax.jit(jnp.linalg.cholesky)
        pallas = jax.jit(lambda m: blocked_cholesky(m, force=True, interpret=False))
        t_xla = timed(xla, a, reps=args.reps)
        t_pal = timed(pallas, a, reps=args.reps)
        row = {"n": n, "xla_ms": round(t_xla * 1e3, 2), "pallas_ms": round(t_pal * 1e3, 2),
               "speedup": round(t_xla / t_pal, 2)}
        # parity
        err = float(jnp.max(jnp.abs(xla(a) - pallas(a))))
        row["max_abs_err"] = err
        if args.grad:
            gx = jax.jit(jax.grad(lambda m: jnp.sum(jnp.linalg.cholesky(m) ** 2)))
            gp = jax.jit(jax.grad(lambda m: jnp.sum(blocked_cholesky(m, force=True, interpret=False) ** 2)))
            row["xla_grad_ms"] = round(timed(gx, a, reps=args.reps) * 1e3, 2)
            row["pallas_grad_ms"] = round(timed(gp, a, reps=args.reps) * 1e3, 2)
            row["grad_err"] = float(jnp.max(jnp.abs(gx(a) - gp(a))))
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
