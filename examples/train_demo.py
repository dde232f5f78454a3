"""End-to-end demo: overfit a frame with momentum-space bursts.

Reproduces the reference's core interactive workflow headlessly — point the
camera at a scene, arm training ('1'), watch the reconstruction converge —
and dumps before/after reconstructions plus the MSE trajectory.

    python examples/train_demo.py --nx 64 --bursts 5 --outdir demo_out
"""

import argparse
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
import csv
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--bursts", type=int, default=5)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--outdir", default="demo_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from spectralae.core.runtime import enable_compilation_cache
    enable_compilation_cache()
    from spectralae.core.config import Config, LayerParams
    from spectralae.model.engine import Engine
    from spectralae.data import pipeline
    from spectralae.viz.png import write_png

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = Config(nx=args.nx, ny=args.nx, d=3,
                 layer=LayerParams(depth=args.depth, lk=1, ll=1, scale=2,
                                   rmax=1.0),
                 fft_iters=args.iters, lr=args.lr)
    eng = Engine(cfg, seed=args.seed)
    frame = next(pipeline.synthetic_frames(args.nx, args.nx, seed=args.seed))
    x = pipeline.frame_to_tensor(frame)

    recon0 = eng.step(x)
    write_png(out / "input.png", pipeline.tensor_to_frame(x))
    write_png(out / "recon_before.png", pipeline.tensor_to_frame(recon0))

    mses = []
    for burst in range(args.bursts):
        eng.toggle_training()          # arm; one burst per arm ('1' key)
        eng.step(x)
        mses.append(eng.last_mse)
        print(f"burst {burst}: mse {eng.last_mse:.6g}", flush=True)

    recon1 = eng.step(x)
    write_png(out / "recon_after.png", pipeline.tensor_to_frame(recon1))
    views = eng.current_views()
    write_png(out / "kernels.png", views["kernel"])
    write_png(out / "feature_map.png", views["feature_map"])
    with open(out / "mse.csv", "w", newline="") as fh:
        wr = csv.writer(fh)
        wr.writerow(["burst", "mse"])
        wr.writerows(enumerate(mses))

    err0 = float(np.mean((recon0 - x) ** 2))
    err1 = float(np.mean((recon1 - x) ** 2))
    print(f"reconstruction mse: {err0:.4g} -> {err1:.4g}")
    return err0, err1


if __name__ == "__main__":
    main()
