"""One process of a 2-process multi-host run (driven by test_multihost.py).

Usage: python multihost_worker.py <port> <process_id>

Each process owns 4 virtual CPU devices; together they form one 8-device
global mesh.  Both processes build identical replicated params, feed their
own half of a deterministic global batch, run the distributed train step
and the distributed burst, and print a JSON line the parent compares.
"""

import json
import os
import sys
from pathlib import Path


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

    from spectralae.dist.multihost import (init_multihost, is_coordinator,
                                           local_batch_to_global)
    init_multihost(f"127.0.0.1:{port}", 2, pid)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from spectralae.core.config import Config, LayerParams
    from spectralae.core.types import (init_opt_state, init_params,
                                       initial_spec)
    from spectralae.dist import mesh as dist
    from spectralae.model import autoencoder as model
    from spectralae.train.fft_dp import distributed_burst

    cfg = Config(nx=16, ny=16, d=2,
                 layer=LayerParams(depth=4, lk=0, ll=0, scale=2, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(0), spec, 0.5)   # same on both
    opt = init_opt_state(params)
    mesh = dist.make_mesh(n_data=8)
    rep = NamedSharding(mesh, P())
    params = jax.tree.map(lambda t: jax.device_put(t, rep), params)
    opt = jax.tree.map(lambda t: jax.device_put(t, rep), opt)

    # deterministic global batch; each process contributes its own half
    gb = (np.random.default_rng(7).normal(size=(8, 2, 16, 16))
          .astype(np.float32) * 20)
    x = local_batch_to_global(mesh, gb[pid * 4:(pid + 1) * 4])

    step = dist.distributed_train_step(mesh)
    losses = []
    for _ in range(5):
        res = step(params, opt, x, spec.scales, lr=0.5, domain="fft")
        params, opt = res.params, res.opt
        losses.append(float(res.loss))

    # distributed burst over the same global batch
    fwd = jax.jit(lambda p, xx: model.forward_fft(p, xx, spec.scales))
    out0 = fwd(params, x)
    enc, dec = params.pair(0)
    burst = distributed_burst(mesh, iters=5)
    r = burst(x, x, out0, enc.c, dec.c, enc.b, dec.b)
    mses = np.asarray(r.mses, dtype=np.float64)

    print(json.dumps({
        "pid": pid,
        "coordinator": is_coordinator(),
        "losses": [round(v, 6) for v in losses],
        "burst_mse0": float(mses[0]), "burst_mseN": float(mses[-1]),
    }), flush=True)


if __name__ == "__main__":
    main()
