"""Mosaic feature probe for the fused-FFT kernels (VERDICT r3 item 10).

Three independent yes/no questions, each a tiny standalone kernel:

  1. lane-strided slice of a loaded value   x[:, j2::4]
  2. sublane-strided slice of a loaded value y[j2::4, :]
  3. static middle-dim store  out_ref[0, k2] = tile  (4D out block)

Strided slices enable the DIT four-step (natural output order, no
permute pass); if Mosaic rejects them the DIF form + host-side constant
permutation is the fallback (ops/pallas_fft.py ships that form).
Run on TPU: each prints OK/FAIL + a value check vs numpy.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if "--cpu" in sys.argv:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectralae.core.runtime import enable_compilation_cache

enable_compilation_cache()


def try_case(name, fn):
    try:
        ok, detail = fn()
        print(f"{name}: {'OK' if ok else 'VALUE-FAIL'} {detail}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def lane_strided():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = x[:, 1::4] * 2.0

    x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((8, 512), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)
    ref = np.asarray(x)[:, 1::4] * 2.0
    err = float(jnp.max(jnp.abs(out - ref)))
    return err == 0.0, f"maxerr={err}"


def sublane_strided():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = x[1::4, :] * 2.0

    x = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((512, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )(x)
    ref = np.asarray(x)[1::4, :] * 2.0
    err = float(jnp.max(jnp.abs(out - ref)))
    return err == 0.0, f"maxerr={err}"


def middle_store():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for k in range(4):
            o_ref[k] = x * (k + 1.0)

    x = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((128, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, 128, 128), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 128, 128), jnp.float32),
    )(x)
    ref = np.asarray(x)[None] * np.arange(1, 5, dtype=np.float32
                                          )[:, None, None]
    err = float(jnp.max(jnp.abs(out - ref)))
    return err == 0.0, f"maxerr={err}"


if __name__ == "__main__":
    try_case("lane_strided", lane_strided)
    try_case("sublane_strided", sublane_strided)
    try_case("middle_store", middle_store)
