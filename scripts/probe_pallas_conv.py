"""TPU probe for ops/pallas_conv.py: the coord conv as a Pallas kernel.

Equality + timing vs lax.conv_general_dilated at the bench.py conv_coord
configs (B=8, D=3, M=10, 256², kernels 5×5 / 13×13 / 33×33), fwd and
fwd+bwd (value_and_grad of a scalar loss — the gradient path the coord
trainers exercise).  Chained trials, floor+median (bench.py
methodology).  VERDICT r4 item 3: probe-or-kill the last north-star
clause (backproplib.cu:70-111, 186-288 as Pallas conv2d fwd/bwd).
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

from bench import time_chained
from spectralae.ops import coord


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--sizes", type=int, nargs="+", default=[5, 13, 33])
    ap.add_argument("--links", type=int, default=10)
    ap.add_argument("--grad", action="store_true",
                    help="also time value_and_grad of sum(conv)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    H = args.nx
    x0 = jax.device_put(rng.standard_normal(
        size=(args.batch, 3, H, H), dtype=np.float32) * 50 + _NONCE)
    fetch = lambda a: float(jnp.sum(a))

    for nk in args.sizes:
        c = jax.device_put(rng.standard_normal(
            size=(args.m, 3, nk, nk), dtype=np.float32))
        bb = jax.device_put(
            rng.standard_normal(size=(args.m,), dtype=np.float32))

        lax_fn = jax.jit(lambda x, c=c, bb=bb: coord.conv2d(
            x, c, bb, tap_mode="ref_gpu", pallas=False))
        pls_fn = jax.jit(lambda x, c=c, bb=bb: coord.conv2d(
            x, c, bb, tap_mode="ref_gpu", pallas=True))

        # correctness on-device vs a HIGHEST-precision truth: the lax
        # baseline's own DEFAULT conv multiplies in bf16 on the MXU
        # (~2e-3 rel), while the Pallas kernel is pure-f32 VPU FMAs
        import jax.lax as jlax

        @jax.jit
        def truth_fn(x, c=c, bb=bb):
            xs = x / c.shape[0]
            wf = c[:, :, ::-1, ::-1]
            pad = coord._conv_padding(nk, nk, "ref_gpu")
            y = jlax.conv_general_dilated(
                xs, wf, (1, 1), pad,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGHEST)
            return y + bb[None, :, None, None]
        yt = truth_fn(x0)
        ya, yb = lax_fn(x0), pls_fn(x0)
        nt = float(jnp.linalg.norm(yt))
        rel_lax = float(jnp.linalg.norm(ya - yt)) / nt
        rel_pls = float(jnp.linalg.norm(yb - yt)) / nt
        print(f"[{nk}x{nk}] rel vs HIGHEST truth: lax-default "
              f"{rel_lax:.3e}  pallas {rel_pls:.3e}")
        assert rel_pls < 1e-5, rel_pls

        def step_l(x, f=lax_fn):
            y = f(x)
            return y, x + y[:, :3] * 1e-9
        def step_p(x, f=pls_fn):
            y = f(x)
            return y, x + y[:, :3] * 1e-9
        tl = time_chained(step_l, x0, n=args.links, trials=3)
        tp = time_chained(step_p, x0, n=args.links, trials=3)
        print(f"[{nk}x{nk}] fwd  lax {tl.best*1e3:8.3f} ms "
              f"(med {tl.median*1e3:8.3f})   pallas {tp.best*1e3:8.3f} ms "
              f"(med {tp.median*1e3:8.3f})   speedup {tl.best/tp.best:.2f}x")

        if args.grad:
            loss_l = jax.jit(jax.value_and_grad(
                lambda c, x: jnp.sum(coord.conv2d(
                    x, c, None, tap_mode="ref_gpu", pallas=False) ** 2)))
            loss_p = jax.jit(jax.value_and_grad(
                lambda c, x: jnp.sum(coord.conv2d(
                    x, c, None, tap_mode="ref_gpu", pallas=True) ** 2)))
            gl, gp = loss_l(c, x0)[1], loss_p(c, x0)[1]
            rel = float(jnp.linalg.norm(gl - gp) / jnp.linalg.norm(gl))
            print(f"[{nk}x{nk}] grad rel err vs lax-default: {rel:.3e}")
            # the lax fwd the autodiff differentiates is itself bf16-
            # rounded (see above) — agreement is bounded by that
            assert rel < 5e-3, rel

            def gstep_l(x, f=loss_l, c=c):
                v, g = f(c, x)
                return g, x + v * 1e-12
            def gstep_p(x, f=loss_p, c=c):
                v, g = f(c, x)
                return g, x + v * 1e-12
            tl = time_chained(gstep_l, x0, n=args.links, trials=3)
            tp = time_chained(gstep_p, x0, n=args.links, trials=3)
            print(f"[{nk}x{nk}] grad lax {tl.best*1e3:8.3f} ms "
                  f"(med {tl.median*1e3:8.3f})   pallas {tp.best*1e3:8.3f}"
                  f" ms (med {tp.median*1e3:8.3f})   "
                  f"speedup {tl.best/tp.best:.2f}x")


if __name__ == "__main__":
    main()
