"""Streaming-training demo: the whole video session in a few jits.

The library's fastest steady-state path — K frames × one fused burst each
inside one ``lax.scan`` (`spectralae.train.streaming`) — applied to a
synthetic moving scene, with a per-frame all-pairs sweep for deeper nets.
Prints per-frame entry/exit MSEs and writes before/after reconstructions.

    python examples/stream_demo.py --nx 64 --frames 12 --layers 2
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--frames", type=int, default=12,
                    help="frames per scan (one jit for all of them)")
    ap.add_argument("--layers", type=int, default=2,
                    help="stage pairs; >1 uses the per-frame pair sweep")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--outdir", default="stream_demo_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from spectralae.core.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from spectralae.core.config import Config, LayerParams
    from spectralae.core.types import ConvStage, initial_spec, init_params
    from spectralae.data import pipeline
    from spectralae.model import autoencoder as model
    from spectralae.train.streaming import fft_stream_pair, fft_stream_sweep
    from spectralae.viz.png import write_png

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = Config(nx=args.nx, ny=args.nx, d=3,
                 layer=LayerParams(depth=10, lk=1, ll=1, scale=2, rmax=1.0))
    spec = initial_spec(cfg)
    for _ in range(args.layers - 1):
        spec = spec.add_pair(cfg.layer)
    params = init_params(jax.random.key(args.seed), spec, 1.0)

    src = pipeline.synthetic_frames(args.nx, args.nx, seed=args.seed)
    xs = jnp.stack([
        jnp.asarray(pipeline.frame_to_tensor(next(src)))[None]
        for _ in range(args.frames)])               # [K, 1, 3, nx, nx]

    fwd = jax.jit(lambda p, xx: model.forward_fft(p, xx, spec.scales))
    # before/after are both evaluated on the LAST frame so the printed
    # delta isolates the training effect from frame content drift
    recon0 = np.asarray(fwd(params, xs[-1])[0])

    if args.layers > 1:
        # every pair bursts on every frame, the whole session in one jit
        r = fft_stream_sweep(xs, params, spec.scales, iters=args.iters,
                             lr=args.lr)
        params = r.params
        for k in range(args.frames):
            row = "  ".join(
                f"pair{n}: {float(r.mses[k, n, 0]):.4g}->"
                f"{float(r.mses[k, n, -1]):.4g}"
                for n in range(spec.n_pairs))
            print(f"frame {k}  {row}", flush=True)
    else:
        r = fft_stream_pair(xs, params, spec.scales, 0, iters=args.iters,
                            lr=args.lr)
        params = params.replace_pair(0, ConvStage(c=r.c, b=r.b),
                                     ConvStage(c=r.f, b=r.p))
        for k in range(args.frames):
            print(f"frame {k}  mse {float(r.mses[k, 0]):.4g}->"
                  f"{float(r.mses[k, -1]):.4g}", flush=True)

    recon1 = np.asarray(fwd(params, xs[-1])[0])
    x_last = np.asarray(xs[-1, 0])
    write_png(out / "input.png", pipeline.tensor_to_frame(x_last))
    write_png(out / "recon_before.png", pipeline.tensor_to_frame(recon0))
    write_png(out / "recon_after.png", pipeline.tensor_to_frame(recon1))
    err0 = float(np.mean((recon0 - x_last) ** 2))
    err1 = float(np.mean((recon1 - x_last) ** 2))
    print(f"reconstruction mse: {err0:.4g} -> {err1:.4g}")
    return err0, err1


if __name__ == "__main__":
    main()
