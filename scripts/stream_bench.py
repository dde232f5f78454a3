"""Streaming-vs-sequential burst throughput at 256² (VERDICT r2 item 4).

Methodology follows bench.py: chained inputs (per-process nonce), final
scalar fetch as the sync point, floor + median over trials.
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
from spectralae.train.streaming import fft_stream

K, ITERS, N = 32, 100, 256


def main():
    rng = np.random.default_rng(0)
    xs = jax.device_put(
        rng.normal(size=(K, 3, N, N)).astype(np.float32) * 50)
    c = jax.device_put(rng.normal(size=(10, 3, 5, 5)).astype(np.float32))
    f = jax.device_put(rng.normal(size=(3, 10, 5, 5)).astype(np.float32))
    b = jax.device_put(rng.normal(size=(10,)).astype(np.float32) * 0.1)
    p = jax.device_put(rng.normal(size=(3,)).astype(np.float32) * 0.1)

    fetch = lambda a: float(jnp.sum(a))

    def run_stream(xs_):
        r = fft_stream(xs_, c, f, b, p, iters=ITERS)
        return xs_ + r.mses[-1, -1] * 0.0 + 1e-6

    def run_sequential(xs_):
        # the best HOST-loop implementation: one jitted fused burst
        # (anchor forward included) per frame — one dispatch per frame
        cc, ff, bb, pp, mom = c, f, b, p, None
        last = None
        for k in range(K):
            last = fft_burst_corr(xs_[k], None, None, cc, ff, bb, pp,
                                  mom, iters=ITERS)
            cc, ff, bb, pp, mom = (last.c, last.f, last.b, last.p,
                                   last.mom)
        return xs_ + last.mses[-1] * 0.0 + 1e-6

    for name, fn, links in (("stream_scan", run_stream, 3),
                            ("sequential", run_sequential, 2)):
        x = xs
        t0 = time.time()
        x = fn(x)          # warmup/compile
        fetch(x)
        print(f"{name}: warmup+compile {time.time()-t0:.1f}s", flush=True)
        samples = []
        for trial in range(5):
            x = xs + (trial + 1) * 1e-5 + _NONCE
            t0 = time.perf_counter()
            fetch(x)
            rt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(links):
                x = fn(x)
            fetch(x)
            samples.append((time.perf_counter() - t0 - rt) / links)
        best, med = min(samples), float(np.median(samples))
        it_s = K * ITERS / med
        print(f"{name}: best {best*1e3:.2f} ms/stream, median "
              f"{med*1e3:.2f} ms -> {it_s:,.0f} it/s sustained "
              f"({K*ITERS/best:,.0f} at floor)", flush=True)


if __name__ == "__main__":
    main()
