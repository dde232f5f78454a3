"""On-device smoke suite: exercises every hot path on the real TPU.

The pytest suite runs on CPU (8 virtual devices); this script verifies the
same paths compile and agree on actual TPU hardware.  Run exclusively
(no concurrent TPU processes — see bench.py methodology notes).

    python scripts/tpu_smoke.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from spectralae.core.runtime import enable_compilation_cache

enable_compilation_cache()

from spectralae.core.config import Config, LayerParams
from spectralae.core.types import initial_spec, init_params, init_opt_state
from spectralae.model import autoencoder as model
from spectralae.ops import spectral
from spectralae.ops.pallas_kernels import spectral_conv_pallas
from spectralae.train.fft import fft_burst
from spectralae.train.fft_pallas import fft_burst_pallas
from spectralae.train.fft_corr import fft_burst_corr
from spectralae.train.fft_iter import fft_burst_itergrid
from spectralae.train.fft_dp import fft_burst_dp
from spectralae.train.coord import coord_step
from spectralae.train.modern import train_step

FAILURES = []


def check(name, ok, detail=""):
    status = "ok" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    cfg = Config(nx=256, ny=256, d=3,
                 layer=LayerParams(depth=10, lk=1, ll=1, scale=2, rmax=1.0))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(0), spec, 1.0)
    enc, dec = params.pair(0)
    x = jax.device_put(rng.normal(size=(3, 256, 256)).astype(np.float32) * 50)

    fwd = jax.jit(lambda p, xx: model.forward_fft(p, xx, spec.scales))
    out0 = fwd(params, x[None])[0]
    check("forward_fft", np.isfinite(float(jnp.sum(out0))))

    # pallas pointwise conv vs einsum, compiled
    @jax.jit
    def conv_check(xx, ck, bb):
        X = spectral.rfft2(xx)
        C = spectral.rfft2(ck)
        want = spectral.spectral_conv(X[None], C, bb, 256, 256)[0]
        got = spectral_conv_pallas(X, C, bb, 256, 256, interpret=False)
        return jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want))

    ck = jax.device_put(rng.normal(size=(10, 3, 256, 256)).astype(np.float32))
    bb = jax.device_put(rng.normal(size=(10,)).astype(np.float32))
    err = float(conv_check(x, ck, bb))
    check("pallas conv_k", err < 1e-5, f"rel err {err:.2e}")

    # fused pair-product+window Pallas kernel vs the XLA path, on-TPU
    from spectralae.train.fft_corr import corr_precompute_fused

    @jax.jit
    def pw_check(xx):
        T0 = corr_precompute_fused(xx[None], enc.c, dec.c, enc.b, dec.b,
                                   pallas_windows=False)
        T1 = corr_precompute_fused(xx[None], enc.c, dec.c, enc.b, dec.b,
                                   pallas_windows=True)
        errs = [jnp.linalg.norm(T1[k] - T0[k])
                / (jnp.linalg.norm(T0[k]) + 1e-30) for k in sorted(T0)]
        return jnp.max(jnp.stack(errs))

    err = float(pw_check(x))
    check("pallas corr windows", err < 1e-5, f"norm rel {err:.2e}")

    # omega_y-chunked anchor kernel (the 4096² scoped-VMEM layout) vs
    # the single-chunk call, compiled on real TPU at small scale
    from spectralae.ops.pallas_windows import anchor_windows
    from spectralae.ops import spectral as _spectral

    @jax.jit
    def yc_check(xx):
        X = _spectral.rfft2(xx[None])
        taps = jax.random.normal(jax.random.key(0),
                                 (xx.shape[0], xx.shape[0], 9, 9)) * 0.1
        n = xx.shape[-1]
        a = anchor_windows(X, taps, n, n, 4, 4, 0.1)
        b_ = anchor_windows(X, taps, n, n, 4, 4, 0.1, y_chunk=7)
        return jnp.max(jnp.stack(
            [jnp.linalg.norm(u - v) / (jnp.linalg.norm(v) + 1e-30)
             for u, v in zip(b_, a)]))

    err = float(yc_check(x))
    check("anchor windows y-chunked", err < 1e-5, f"norm rel {err:.2e}")

    # burst implementations agree
    kw = dict(lr=0.2, iters=5)
    r_jnp = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                      impl="dft", **kw)
    r_pal = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b, **kw)
    r_cor = fft_burst_corr(x, x, out0, enc.c, dec.c, enc.b, dec.b, **kw)
    r_itg = fft_burst_itergrid(x, x, out0, enc.c, dec.c, enc.b, dec.b, **kw)
    m0 = np.asarray(r_jnp.mses)
    for name, r in (("pallas", r_pal), ("corr", r_cor), ("itergrid", r_itg)):
        d = float(np.max(np.abs(np.asarray(r.mses) - m0)
                         / np.maximum(np.abs(m0), 1e-9)))
        check(f"burst[{name}] vs jnp", d < 1e-3, f"max rel {d:.2e}")

    # batched DP burst
    xs = jax.device_put(rng.normal(size=(4, 3, 256, 256)).astype(np.float32)
                        * 50)
    out0s = fwd(params, xs)
    r_dp = fft_burst_dp(xs, xs, out0s, enc.c, dec.c, enc.b, dec.b,
                        lr=0.2, iters=5)
    check("fft_burst_dp b4", np.isfinite(np.asarray(r_dp.mses)).all())

    # coord train step
    acts = jax.jit(lambda xx: model.forward_coord(
        params, xx, spec.scales, tap_mode="ref_gpu"))(x[None])
    mom = tuple(jnp.zeros_like(t) for t in (enc.c, dec.c, enc.b, dec.b))
    r_c = coord_step(acts[1][0], acts[-2][0], acts[2][0],
                     enc.c, dec.c, enc.b, dec.b, mom, mom, lr=0.2)
    check("coord_step", np.isfinite(float(r_c.mse)))

    # modern batched step
    opt = init_opt_state(params)
    r_m = train_step(params, opt, xs, spec.scales, lr=0.2, domain="fft")
    check("modern train_step", np.isfinite(float(r_m.loss)))

    # fused anchor vs explicit true-forward anchor — ON TPU this also
    # validates the reduced-precision choices in the fused precompute
    # (bf16_3x anchor spectra) against the measured-G0 contract
    from spectralae.train.fft_corr import _true_forward
    o0t = jax.jit(lambda xx: _true_forward(
        xx[None], enc.c, dec.c, enc.b, dec.b, True)[0])(x)
    r_unf = fft_burst_corr(x, None, o0t, enc.c, dec.c, enc.b, dec.b, **kw)
    r_fus = fft_burst_corr(x, None, None, enc.c, dec.c, enc.b, dec.b,
                           **kw)
    d = float(np.max(np.abs(np.asarray(r_fus.mses)
                            - np.asarray(r_unf.mses))
                     / np.maximum(np.abs(np.asarray(r_unf.mses)), 1e-9)))
    check("burst[fused] vs unfused", d < 1e-3, f"max rel {d:.2e}")

    # streaming scan == sequential fused bursts
    from spectralae.train.streaming import fft_stream
    xs4 = jax.device_put(
        rng.normal(size=(4, 3, 256, 256)).astype(np.float32) * 50)
    r_st = fft_stream(xs4, enc.c, dec.c, enc.b, dec.b, iters=5)
    cc, ff, bb2, pp, mo = enc.c, dec.c, enc.b, dec.b, None
    for k in range(4):
        r_sq = fft_burst_corr(xs4[k], None, None, cc, ff, bb2, pp, mo,
                              lr=0.2, iters=5)
        cc, ff, bb2, pp, mo = r_sq.c, r_sq.f, r_sq.b, r_sq.p, r_sq.mom
    # norm-relative: elementwise-relative inflates near-zero kernel
    # entries (TPU scan-vs-dispatch reassociation noise; CPU equality is
    # tight at 2e-5 in tests/test_streaming.py)
    d = float(np.max(np.abs(np.asarray(r_st.c) - np.asarray(cc)))
              / np.max(np.abs(np.asarray(cc))))
    check("stream scan vs sequential", d < 1e-3, f"norm rel {d:.2e}")

    # per-frame all-pairs sweep (2-pair net) vs the host pair loop
    from spectralae.core.types import ConvStage
    from spectralae.train.streaming import _pair_input, fft_stream_sweep
    spec2 = spec.add_pair(cfg.layer)
    params2 = init_params(jax.random.key(1), spec2, 1.0)
    xs2 = jax.device_put(
        rng.normal(size=(2, 1, 3, 256, 256)).astype(np.float32) * 50)
    r_sw = fft_stream_sweep(xs2, params2, spec2.scales, iters=4)
    prm = params2
    act = jax.jit(lambda p, xx, n: _pair_input(p, xx, spec2.scales, n),
                  static_argnums=2)
    moms2 = {n: None for n in range(spec2.n_pairs)}
    for k in range(2):
        for n_l in range(spec2.n_pairs):
            e2, d2 = prm.pair(n_l)
            r_sq = fft_burst_corr(act(prm, xs2[k], n_l), None, None,
                                  e2.c, d2.c, e2.b, d2.b, moms2[n_l],
                                  lr=0.2, iters=4)
            prm = prm.replace_pair(n_l, ConvStage(c=r_sq.c, b=r_sq.b),
                                   ConvStage(c=r_sq.f, b=r_sq.p))
            moms2[n_l] = r_sq.mom
    d = max(float(np.max(np.abs(np.asarray(r_sw.params.stages[i].c)
                                - np.asarray(prm.stages[i].c)))
                  / np.max(np.abs(np.asarray(prm.stages[i].c))))
            for i in range(len(prm.stages)))
    check("stream sweep vs host pair loop", d < 1e-3,
          f"norm rel {d:.2e}")

    # coordinate-domain stream vs the host [forward -> crop -> step] loop
    from spectralae.ops import coord as coord_ops
    from spectralae.train.streaming import coord_stream
    xs3 = jax.device_put(
        rng.normal(size=(3, 1, 3, 256, 256)).astype(np.float32) * 50)
    r_cs = coord_stream(xs3, params, spec.scales, 0, q=2, lr=0.2)
    prm = params
    fwd_c = jax.jit(lambda p, xx: model.forward_coord(
        p, xx, spec.scales, tap_mode="ref_gpu"))
    e3, d3 = prm.pair(0)
    mo3 = tuple(jnp.zeros_like(t) for t in (e3.c, d3.c, e3.b, d3.b))
    pg3 = mo3
    for k in range(3):
        acts3 = fwd_c(prm, xs3[k])
        crop = lambda a: coord_ops.center_crop(a[0], 2)
        e3, d3 = prm.pair(0)
        r_k = coord_step(crop(acts3[1]), crop(acts3[-2]), crop(acts3[2]),
                         e3.c, d3.c, e3.b, d3.b, mo3, pg3, lr=0.2)
        mo3, pg3 = r_k.mom, r_k.prev_grad
        prm = prm.replace_pair(0, ConvStage(c=r_k.c, b=r_k.b),
                               ConvStage(c=r_k.f, b=r_k.p))
    d = float(np.max(np.abs(np.asarray(r_cs.params.stages[0].c)
                            - np.asarray(prm.stages[0].c)))
              / np.max(np.abs(np.asarray(prm.stages[0].c))))
    check("coord stream vs host loop", d < 1e-3, f"norm rel {d:.2e}")

    # burst convergence end-to-end
    t0 = time.perf_counter()
    r100 = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                            lr=0.2, iters=100)
    m = np.asarray(r100.mses)
    check("burst converges", m[-1] < m[1],
          f"mse {m[1]:.4g} -> {m[-1]:.4g} ({time.perf_counter()-t0:.1f}s)")

    if FAILURES:
        print("FAILED:", FAILURES)
        sys.exit(1)
    print("all TPU smoke checks passed")


if __name__ == "__main__":
    main()
