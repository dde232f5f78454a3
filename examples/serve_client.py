"""Minimal client for the HTTP inference endpoint (`spectralae serve --http`).

    # terminal 1: export + serve (dynamic batching on)
    python -m spectralae.cli.main export --nx 64 --out /tmp/art --what forward
    python -m spectralae.cli.main serve --model /tmp/art --http 8000 \
        --http-batch-ms 5

    # terminal 2:
    python examples/serve_client.py --url http://127.0.0.1:8000

Posts an ``.npy``-serialized float32 batch to ``/infer`` and prints the
reconstruction error — stdlib only, no jax required on the client.
"""

import argparse
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
import io
import json
import urllib.request

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    with urllib.request.urlopen(f"{args.url}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    print("server:", health)
    d, nx, ny = health["input_shape"]

    x = (np.random.default_rng(args.seed)
         .uniform(0, 255, size=(args.batch, d, nx, ny)).astype(np.float32))
    buf = io.BytesIO()
    np.save(buf, x)
    req = urllib.request.Request(f"{args.url}/infer", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        out = np.load(io.BytesIO(r.read()), allow_pickle=False)
    print("output:", out.shape, out.dtype)
    print("reconstruction mse:", float(np.mean((out - x) ** 2)))


if __name__ == "__main__":
    main()
