"""Stage-A probe for the fused-FFT anchor (VERDICT r3 item 10).

Question: can a Pallas kernel compute the signal's y-axis DFT *in-kernel*
(pixel x tiles -> MXU matmuls against the [ny, nyr] cos/sin bases) fast
enough to beat XLA's rfft2 call (~5.7-6.2 ms at 2048^2, flat per call —
ROADMAP "Beating XLA's FFT" probes a+c)?

The fused-anchor rewrite this gates: the x-axis stage of every window
transform collapses to shifted-row correlations of the y-transformed
signal (convolution theorem: elementwise-in-omega_x products of
DFT_x rows ARE circular x-correlations), so the 2D FFT disappears from
the burst entirely if the y-DFT matmul is cheap in-kernel.

The probe kernel reads pixel x ONCE (the fused traffic contract), builds
Y = x @ (cos - i sin) per x-row tile in VMEM, and emits only a tiny
weighted-energy reduction (stands in for the downstream window
contractions).  Timed at DEFAULT and HIGHEST dot precision; correctness
vs jnp.fft.rfft on the same reduction.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

_NONCE = np.float32((os.getpid() % 9973) * 1e-7 + (time.time() % 1) * 1e-5)

if "--check" in sys.argv:
    # force CPU the way tests/conftest.py does — the env var alone loses
    # to the sitecustomize axon plugin, and an interpret-mode check over
    # the TPU tunnel hangs for minutes
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if "--check" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectralae.core.runtime import enable_compilation_cache

enable_compilation_cache()

from spectralae.ops.pallas_kernels import _on_tpu


def _make_kernel(D, TX, nx, precision):
    def kernel(x_ref, cb_ref, sb_ref, w_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, (TX, 1), 0) + i * TX
        mask = rows < nx
        cb = cb_ref[:]
        sb = sb_ref[:]
        w = w_ref[:]
        for d in range(D):
            xd = jnp.where(mask, x_ref[0, d], 0.0)
            yr = jnp.dot(xd, cb, preferred_element_type=jnp.float32,
                         precision=precision)
            yi = -jnp.dot(xd, sb, preferred_element_type=jnp.float32,
                          precision=precision)
            acc_ref[:] += jnp.sum(w * (yr * yr + yi * yi)).reshape(1, 1)

    return kernel


def ydft_energy(x, *, y_chunk=512, precision=jax.lax.Precision.DEFAULT,
                interpret=None):
    """sum_d sum_r sum_wy w(wy) |DFT_y(x)[d, r, wy]|^2 with the y-DFT
    computed in-kernel from pixel rows."""
    if interpret is None:
        interpret = not _on_tpu()
    D, nx, ny = x.shape
    nyr = ny // 2 + 1
    wy = np.arange(ny)[:, None]
    wv = np.arange(nyr)[None, :]
    ang = 2 * np.pi * (wy * wv) / ny
    cosb = jnp.asarray(np.cos(ang), jnp.float32)          # [ny, nyr]
    sinb = jnp.asarray(np.sin(ang), jnp.float32)
    from spectralae.ops.spectral import _hermitian_weights
    w = jnp.asarray(_hermitian_weights(nx, ny))[None, :]  # [1, nyr]

    TX = 64
    grid = (pl.cdiv(nx, TX),)
    n_chunks = max(1, -(-nyr // y_chunk))
    edges = [round(c * nyr / n_chunks) for c in range(n_chunks + 1)]

    total = jnp.zeros((), jnp.float32)
    for a, b in zip(edges, edges[1:]):
        nc = b - a
        out = pl.pallas_call(
            _make_kernel(D, TX, nx, precision),
            grid=grid,
            in_specs=[pl.BlockSpec((1, D, TX, ny), lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((ny, nc), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((ny, nc), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, nc), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            interpret=interpret,
        )(x[None], cosb[:, a:b], sinb[:, a:b], w[:, a:b])
        total = total + out[0, 0]
    return total


def ref_energy(x):
    from spectralae.ops.spectral import _hermitian_weights
    Y = jnp.fft.rfft(x, axis=-1)
    w = jnp.asarray(_hermitian_weights(x.shape[-2], x.shape[-1]))
    return jnp.sum(w[None, None, :] * (Y.real ** 2 + Y.imag ** 2))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--check", action="store_true",
                    help="tiny-shape interpret-mode correctness only")
    args = ap.parse_args()

    if args.check:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, 32, 48)).astype(np.float32))
        got = float(ydft_energy(x, y_chunk=16, interpret=True))
        ref = float(ref_energy(x))
        rel = abs(got - ref) / abs(ref)
        print(f"interpret check: got {got:.6g} ref {ref:.6g} rel {rel:.2e}")
        assert rel < 1e-5
        print("OK")
        return

    N = args.n
    rng = np.random.default_rng(0)
    x0 = jax.device_put(rng.normal(size=(3, N, N)).astype(np.float32))
    fetch = lambda a: float(jnp.sum(a))

    fns = {
        "xla_rfft_y": jax.jit(ref_energy),
        "pallas_default": jax.jit(functools_partial(
            ydft_energy, precision=jax.lax.Precision.DEFAULT)),
        "pallas_highest": jax.jit(functools_partial(
            ydft_energy, precision=jax.lax.Precision.HIGHEST)),
    }
    ref_val = None
    for name, fn in fns.items():
        run = jax.jit(lambda x, fn=fn: x + fn(x) * 0.0 + 1e-6)
        t0 = time.time()
        v = float(fn(x0))
        fetch(run(x0))
        print(f"{name}: warmup {time.time()-t0:.1f}s  val {v:.6g}"
              + ("" if ref_val is None else
                 f"  rel {abs(v-ref_val)/abs(ref_val):.2e}"), flush=True)
        if ref_val is None:
            ref_val = v
        samples = []
        for trial in range(5):
            x = x0 + (trial + 1) * 1e-6 + _NONCE
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


def functools_partial(fn, **kw):
    import functools
    return functools.partial(fn, **kw)


if __name__ == "__main__":
    main()
