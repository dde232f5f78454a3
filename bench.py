"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: momentum-space (FFT) backprop inner-iterations/sec at 256×256,
M=10, D=3, 5×5 kernels — the reference's hot training loop
(source/fft_backproplib.cu:1446: 100 iterations per keypress).

``vs_baseline``: the reference publishes no numbers (BASELINE.md).  The
denominator is a documented *estimate* of the reference GPU's inner-loop
rate: each iteration runs a gradient kernel over M·D·256·129 bins, four
full-size cuFFT execs, two conv kernels, a Thrust reduce with device→host
sync, and a console print, on an sm_50-class part — ≈100 it/s is a generous
estimate (≥10 ms/iter).  The north-star target is ≥10× that (BASELINE.json).

Extended results (forward fps both domains, coord step rate, batched modern
step) are written to bench_details.json.
"""

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from spectralae.core.config import Config, LayerParams
from spectralae.core.types import initial_spec, init_params, init_opt_state
from spectralae.model import autoencoder as model
from spectralae.train.fft import fft_burst
from spectralae.train.coord import coord_step
from spectralae.train.modern import train_step

REFERENCE_FFT_ITERS_PER_SEC_ESTIMATE = 100.0


def timeit(fn, *, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    results = {}
    rng = np.random.default_rng(0)
    cfg = Config(nx=256, ny=256, d=3,
                 layer=LayerParams(depth=10, lk=1, ll=1, scale=2, rmax=3.0))
    spec = initial_spec(cfg)
    spec3 = spec.add_pair(cfg.layer).add_pair(cfg.layer)
    params1 = init_params(jax.random.key(0), spec, 1.0)
    params3 = init_params(jax.random.key(0), spec3, 1.0)

    x1 = jnp.asarray(rng.normal(size=(cfg.d, 256, 256)).astype(np.float32)) * 50
    xb = jnp.asarray(rng.normal(size=(1, cfg.d, 256, 256)).astype(np.float32)) * 50

    # ---- headline: FFT backprop burst at 256×256 (stage pair 0) ----
    enc, dec = params1.pair(0)
    out0 = model.forward_fft(params1, x1[None], spec.scales)[0]
    burst_iters = 100

    def burst():
        return fft_burst(x1, x1, out0, enc.c, dec.c, enc.b, dec.b,
                         lr=0.2, iters=burst_iters)

    dt = timeit(burst, iters=5, warmup=2)
    fft_steps_per_sec = burst_iters / dt
    results["fft_backprop_iters_per_sec_256"] = fft_steps_per_sec
    results["fft_burst_100_ms"] = dt * 1e3

    # ---- forward passes, 3-layer net ----
    fwd_fft = jax.jit(lambda p, x: model.forward_fft(p, x, spec3.scales))
    dt = timeit(lambda: fwd_fft(params3, xb), iters=20, warmup=3)
    results["forward_fft_3layer_256_ms"] = dt * 1e3
    results["forward_fft_3layer_256_fps"] = 1.0 / dt

    fwd_coord = jax.jit(
        lambda p, x: model.forward_coord(p, x, spec3.scales)[-1])
    dt = timeit(lambda: fwd_coord(params3, xb), iters=20, warmup=3)
    results["forward_coord_3layer_256_ms"] = dt * 1e3

    # ---- coordinate-space reference train step (pair 0, q=1 patch) ----
    acts = model.forward_coord(params1, xb, spec.scales, tap_mode="ref_gpu")
    mom = tuple(jnp.zeros_like(t) for t in (enc.c, dec.c, enc.b, dec.b))

    def cstep():
        return coord_step(acts[1][0], acts[-2][0], acts[2][0],
                          enc.c, dec.c, enc.b, dec.b, mom, mom, lr=0.2)

    dt = timeit(cstep, iters=10, warmup=2)
    results["coord_step_128_ms"] = dt * 1e3
    results["coord_steps_per_sec"] = 1.0 / dt

    # ---- modern batched train step (3-layer, batch 8, fft domain) ----
    opt3 = init_opt_state(params3)
    xb8 = jnp.asarray(rng.normal(size=(8, cfg.d, 256, 256)).astype(np.float32))

    def mstep():
        return train_step(params3, opt3, xb8, spec3.scales, lr=0.2,
                          domain="fft")

    dt = timeit(mstep, iters=10, warmup=2)
    results["modern_fft_step_b8_ms"] = dt * 1e3
    results["modern_fft_frames_per_sec"] = 8.0 / dt

    results["device"] = str(jax.devices()[0])
    with open("bench_details.json", "w") as f:
        json.dump(results, f, indent=2)

    print(json.dumps({
        "metric": "fft_backprop_iters_per_sec_256",
        "value": round(fft_steps_per_sec, 1),
        "unit": "iters/s",
        "vs_baseline": round(
            fft_steps_per_sec / REFERENCE_FFT_ITERS_PER_SEC_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
