"""TPU probe for ops/pallas_fft.py: equality + timing vs jnp.fft.rfft2.

Times the mixed-order pipeline (the burst's consumption format), the
natural-order drop-in, and XLA's rfft2 at [3, N, N] — chained trials,
floor+median (bench.py methodology).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

_NONCE = np.float32((os.getpid() % 9973) * 1e-7 + (time.time() % 1) * 1e-5)

import jax
import jax.numpy as jnp

from spectralae.core.runtime import enable_compilation_cache

enable_compilation_cache()

from spectralae.ops.pallas_fft import rfft2_mixed, rfft2_pallas


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--precision", default="default",
                    choices=["default", "high", "highest"])
    args = ap.parse_args()
    N = args.n
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[args.precision]

    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        rng.standard_normal(size=(3, N, N), dtype=np.float32) * 50)
    fetch = lambda a: float(jnp.sum(a))

    # correctness first — separate jits (a combined program stalled
    # compile >25 min on this toolchain), diffed on device via two
    # scalar fetches
    @jax.jit
    def ref_fn(x):
        X = jnp.fft.rfft2(x)
        return jnp.sum(jnp.abs(X) ** 2), X

    @jax.jit
    def got_fn(x):
        X = rfft2_pallas(x, precision=prec)
        return jnp.sum(jnp.abs(X) ** 2), X

    t0 = time.time()
    e_ref, Xr = ref_fn(x0)
    e_ref = float(e_ref)
    print(f"xla rfft2 energy {e_ref:.6e} ({time.time()-t0:.1f}s)",
          flush=True)
    t0 = time.time()
    e_got, Xg = got_fn(x0)
    e_got = float(e_got)
    print(f"pallas rfft2 energy {e_got:.6e} rel "
          f"{abs(e_got-e_ref)/e_ref:.2e} ({time.time()-t0:.1f}s)",
          flush=True)
    d = float(jax.jit(lambda a, b: jnp.linalg.norm(a - b)
                      / jnp.linalg.norm(b))(Xg, Xr).real)
    print(f"relerr vs jnp.fft.rfft2 @{N}² ({args.precision}): {d:.3e}",
          flush=True)
    del Xr, Xg

    fns = {
        "xla_rfft2": jax.jit(lambda x: jnp.fft.rfft2(x)),
        "pallas_mixed": jax.jit(lambda x: rfft2_mixed(x, precision=prec)),
        "pallas_mixed_bf16": jax.jit(lambda x: rfft2_mixed(
            x, precision=prec, out_dtype=jnp.bfloat16)),
        "pallas_natural": jax.jit(lambda x: rfft2_pallas(
            x, precision=prec)),
    }
    for name, fn in fns.items():
        def run(x, fn=fn):
            out = fn(x)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                    for l in leaves)
            return x + s * 0.0 + 1e-6
        run = jax.jit(run)
        t0 = time.time()
        fetch(run(x0))
        print(f"{name}: warmup {time.time()-t0:.1f}s", flush=True)
        samples = []
        for trial in range(5):
            x = x0 + (trial + 1) * 1e-6 + _NONCE
            fetch(x)
            t0 = time.perf_counter()
            fetch(x)
            rt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(8):
                x = run(x)
            fetch(x)
            samples.append((time.perf_counter() - t0 - rt) / 8)
        best, med = min(samples), float(np.median(samples))
        print(f"{name}: best {best*1e3:.2f} ms median {med*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
