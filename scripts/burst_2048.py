"""2048² (4.2 MP) burst cost: fused vs unfused anchor (VERDICT r2 item 3).

Round 2 measured 9.7 ms/100-iter burst at 2048² — the precompute's signal
FFTs/plane products re-emerge at 2048².  The fused anchor eliminates the
out0 FFT and the XG0 plane pipeline; this script measures both contracts.
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

from spectralae.train.fft_corr import fft_burst_corr, _true_forward

N, ITERS = 2048, 100


def main():
    global N
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=N,
                    help="grid edge (4096 exercises the omega_y-chunked "
                         "kernel; 4096² needs it to fit scoped VMEM)")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant-name substrings to run "
                         "(e.g. 'fused-fft-bf16,fused' — big N compiles "
                         "are minutes each)")
    args = ap.parse_args()
    N = args.n
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        rng.normal(size=(3, N, N)).astype(np.float32) * 50)
    c = jax.device_put(rng.normal(size=(10, 3, 5, 5)).astype(np.float32))
    f = jax.device_put(rng.normal(size=(3, 10, 5, 5)).astype(np.float32))
    b = jax.device_put(rng.normal(size=(10,)).astype(np.float32) * 0.1)
    p = jax.device_put(rng.normal(size=(3,)).astype(np.float32) * 0.1)
    fetch = lambda a: float(jnp.sum(a))

    def run_fused(x):
        r = fft_burst_corr(x, None, None, c, f, b, p, iters=ITERS)
        return x + r.mses[-1] * 0.0 + 1e-6

    def run_pw(pw):
        def run(x):
            r = fft_burst_corr(x, None, None, c, f, b, p, iters=ITERS,
                               pallas_windows=pw)
            return x + r.mses[-1] * 0.0 + 1e-6
        return run

    variants = [("fused", run_fused),
                # Pallas radix-4 four-step rfft2 feeding the anchor in
                # mixed bin order (ops/pallas_fft.py) — vs XLA's FFT
                ("fused-fft", run_pw("fft")),
                ("fused-fft-bf16", run_pw("fft-bf16")),
                ("fused-bf16", run_pw("bf16"))]
    # the unfused contract needs out0 via _true_forward, whose [M, D,
    # nx, nyr] kernel spectra are 32 GB at 16384² — single-chip HBM ends
    # for THAT path well before the fused burst's own ~13 GB wall.
    # Only pay that forward when the unfused variant will actually run
    # (--only excluding it must not burn the compile or the HBM).
    want = ([k.strip() for k in args.only.split(",")] if args.only
            else None)
    if N <= 8192 and (want is None or "unfused" in want):
        out0 = jax.jit(lambda xx: _true_forward(
            xx[None], c, f, b, p, True)[0])(x0)
        fetch(out0)

        def run_unfused(x):
            r = fft_burst_corr(x, None, out0, c, f, b, p, iters=ITERS)
            return x + r.mses[-1] * 0.0 + 1e-6
        variants.append(("unfused", run_unfused))

    if args.only:
        keys = [k.strip() for k in args.only.split(",")]
        variants = [(n_, f) for n_, f in variants if n_ in keys]
    for name, fn in variants:
        t0 = time.time()
        try:
            xw = fn(x0)
            fetch(xw)
        except Exception as e:      # noqa: BLE001 — record, keep going
            msg = str(e).replace("\n", " | ")[:200]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
            continue
        print(f"{name}: warmup+compile {time.time()-t0:.1f}s", flush=True)
        if N > 8192:
            # 16384² peak-HBM budget: x (3.22 GB) + X half-spectra
            # (3.22) + the rfft2 transpose transient (~3.22) + the
            # anchor kernel's split re/im planes (3.22) ≈ 12.9 GB of
            # the chip's 16 — holding a SECOND resolution buffer across
            # the trial loop is what OOMs, not the burst itself.  Chain
            # every trial from one live buffer (the warmup output);
            # the per-trial perturbation below still de-dups the relay.
            x0, x = None, xw
        else:
            x = None
        xw = None
        samples = []
        for trial in range(5):
            x = (x if x0 is None else x0) + (trial + 1) * 1e-5 + _NONCE
            t0 = time.perf_counter()
            fetch(x)
            rt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(6):
                x = fn(x)
            fetch(x)
            samples.append((time.perf_counter() - t0 - rt) / 6)
        best, med = min(samples), float(np.median(samples))
        print(f"{name}: best {best*1e3:.2f} ms/burst, median "
              f"{med*1e3:.2f} ms -> {ITERS/med:,.0f} it/s", flush=True)


if __name__ == "__main__":
    main()
