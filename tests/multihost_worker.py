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

    # DP×TP across the process boundary: a (data=4, model=2) mesh whose
    # 'model' axis PAIRS one device from each host (interleaved device
    # order) — the corr precompute's plane transforms shard over it and
    # the window all_gather crosses processes.  Model-replication across
    # hosts means every host holds each data shard, so the local batch
    # is the full global batch here.
    by_proc = [[d for d in jax.devices() if d.process_index == i]
               for i in range(2)]
    interleaved = [d for pair in zip(*by_proc) for d in pair]
    mesh_tp = dist.make_mesh(n_data=4, n_model=2, devices=interleaved)
    x_tp = jax.make_array_from_process_local_data(
        dist.batch_sharding(mesh_tp), gb)
    rep_tp = NamedSharding(mesh_tp, P())
    params_tp = jax.tree.map(lambda t: jax.device_put(
        np.asarray(t), rep_tp), params)
    enc_tp, dec_tp = params_tp.pair(0)
    out0_tp = jax.jit(lambda p, xx: model.forward_fft(
        p, xx, spec.scales))(params_tp, x_tp)
    r_tp = distributed_burst(mesh_tp, iters=5)(
        x_tp, x_tp, out0_tp, enc_tp.c, dec_tp.c, enc_tp.b, dec_tp.b)
    mses_tp = np.asarray(r_tp.mses, dtype=np.float64)

    # streaming trainer across the process boundary: 2 frames × a 3-iter
    # burst each inside one sharded scan, per-frame batch split across
    # the hosts' data shards (the production steady-state path)
    from jax import shard_map
    from spectralae.train.streaming import StreamResult, stream_bursts
    xs_stream = jnp.stack([x, x + 1.0])          # [K=2, 8, 2, 16, 16]
    xs_stream = jax.device_put(
        xs_stream, NamedSharding(mesh, P(None, "data")))
    stream_sharded = jax.jit(shard_map(
        lambda xs_, c, f, b, p: stream_bursts(
            xs_, c, f, b, p, iters=3, axis_name="data"),
        mesh=mesh,
        in_specs=(P(None, "data"), P(), P(), P(), P()),
        out_specs=StreamResult(c=P(), f=P(), b=P(), p=P(),
                               mom=(P(), P(), P(), P()), mses=P()),
        check_vma=False))
    r_st = stream_sharded(xs_stream, enc.c, dec.c, enc.b, dec.b)
    mses_st = np.asarray(r_st.mses, dtype=np.float64)

    print(json.dumps({
        "pid": pid,
        "coordinator": is_coordinator(),
        "losses": [round(v, 6) for v in losses],
        "burst_mse0": float(mses[0]), "burst_mseN": float(mses[-1]),
        "tp_mse0": float(mses_tp[0]), "tp_mseN": float(mses_tp[-1]),
        "stream_mse0": float(mses_st[0, 0]),
        "stream_mseN": float(mses_st[-1, -1]),
    }), flush=True)


if __name__ == "__main__":
    main()
