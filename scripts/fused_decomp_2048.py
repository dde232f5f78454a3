"""Attribute the FUSED precompute's cost at 2048² (chained methodology)."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

_NONCE = np.float32((os.getpid() % 9973) * 1e-7 + (time.time() % 1) * 1e-5)

import jax
import jax.numpy as jnp

from spectralae.core.runtime import enable_compilation_cache

enable_compilation_cache()

from spectralae.ops import dft, spectral
from spectralae.train import fft_corr

N, D, M = 2048, 3, 10


def fetch(a):
    return float(jnp.sum(a))


def time_chained(step, x0, n=6, trials=4):
    x = x0
    r, x = step(x)
    fetch(x)
    samples = []
    for t in range(trials):
        x = x0 + (t + 1) * 1e-5 + _NONCE
        t0 = time.perf_counter()
        fetch(x)
        rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            r, x = step(x)
        fetch(x)
        samples.append((time.perf_counter() - t0 - rt) / n)
    return min(samples), float(np.median(samples))


def main():
    rng = np.random.default_rng(0)
    x0 = jax.device_put(rng.normal(size=(1, D, N, N)).astype(np.float32)
                        * 50)
    c = jax.device_put(rng.normal(size=(M, D, 5, 5)).astype(np.float32))
    f = jax.device_put(rng.normal(size=(D, M, 5, 5)).astype(np.float32))
    b = jax.device_put(rng.normal(size=(M,)).astype(np.float32) * 0.1)
    p = jax.device_put(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    maps = fft_corr._lag_maps(5, 5)
    hx2, hy2 = maps["l2ext"]
    hx4, hy4 = maps["v4ext"]
    nyr = N // 2 + 1

    @jax.jit
    def st_fft(x):
        X = spectral.rfft2(x)
        return X, x + X.reshape(-1)[0].real * 1e-9

    @jax.jit
    def st_k0f(x):
        P = 25
        K2 = jnp.einsum("emq,mdr->edqr", f.reshape(D, M, P),
                        c.reshape(M, D, P)).reshape(D * D, P * P)
        K0taps = (K2 @ jnp.asarray(maps["g_scatter_pair"])
                  ).reshape(D, D, 2 * hx2 + 1, 2 * hy2 + 1)
        K0f = dft.kernel_spectrum(K0taps + x[0, 0, 0, 0] * 1e-9, N, N,
                                  precision="high")
        return K0f, x + K0f.reshape(-1)[0].real * 1e-9

    X_c = st_fft(x0)[0]
    K0f_c = st_k0f(x0)[0]

    @jax.jit
    def _eg(X_in, K0f_in, x):
        X = X_in + x[..., :1, :1] * 1e-9
        return jnp.einsum("edxy,bdxy->bexy", K0f_in, X,
                          precision="highest") / (M * D) - X

    def st_eg(x):
        EG = _eg(X_c, K0f_c, x)
        return EG, x + EG.reshape(-1)[0].real * 1e-9

    EG_c = st_eg(x0)[0]

    @jax.jit
    def _xxwin(X_in, x):
        X = X_in + x[..., :1, :1] * 1e-9
        prods = jnp.mean(jnp.conj(X)[:, :, None] * X[:, None],
                         axis=0).reshape(-1, N, nyr)
        return fft_corr._corr_windows(prods, N, N, hx4, hy4)

    def st_xxwin(x):
        w = _xxwin(X_c, x)
        return w, x + w.reshape(-1)[0] * 1e-9

    @jax.jit
    def _egwin(X_in, EG_in, x):
        X = X_in + x[..., :1, :1] * 1e-9
        EG = EG_in + x[..., :1, :1] * 1e-9
        prods = jnp.mean(jnp.conj(X)[:, :, None] * EG[:, None],
                         axis=0).reshape(-1, N, nyr)
        return fft_corr._corr_windows(prods, N, N, hx2, hy2)

    def st_egwin(x):
        w = _egwin(X_c, EG_c, x)
        return w, x + w.reshape(-1)[0] * 1e-9

    @jax.jit
    def _seg(EG_in, x):
        EG = EG_in + x[..., :1, :1] * 1e-9
        wv = jnp.asarray(fft_corr._herm_w(N, N))
        return jnp.mean(jnp.sum((EG.real ** 2 + EG.imag ** 2) * wv,
                                axis=(-2, -1, -3)))

    def st_seg(x):
        s = _seg(EG_c, x)
        return s, x + s * 1e-12

    def st_pre(x):
        T = fft_corr.fft_burst_corr(x[0], None, None, c, f, b, p, iters=0)
        return T, x + T.mses[-1] * 1e-12

    def st_full(x):
        r = fft_corr.fft_burst_corr(x[0], None, None, c, f, b, p,
                                    iters=100)
        return r, x + r.mses[-1] * 1e-12

    from spectralae.ops.pallas_windows import corr_pair_windows

    @jax.jit
    def _xxwin_pl(X_in, x):
        X = X_in + x[..., :1, :1] * 1e-9
        return corr_pair_windows(X, X, N, N, hx4, hy4)

    def st_xxwin_pl(x):
        w = _xxwin_pl(X_c, x)
        return w, x + w.reshape(-1)[0] * 1e-9

    @jax.jit
    def _egwin_pl(X_in, EG_in, x):
        X = X_in + x[..., :1, :1] * 1e-9
        EG = EG_in + x[..., :1, :1] * 1e-9
        return corr_pair_windows(X, EG, N, N, hx2, hy2)

    def st_egwin_pl(x):
        w = _egwin_pl(X_c, EG_c, x)
        return w, x + w.reshape(-1)[0] * 1e-9

    for name, st in (("rfft2(x) [3 planes]", st_fft),
                     ("K0f spectra [9 planes]", st_k0f),
                     ("EG contraction", st_eg),
                     ("XX products+windows (±4h)", st_xxwin),
                     ("EG products+windows (±2h)", st_egwin),
                     ("XX windows pallas (±4h)", st_xxwin_pl),
                     ("EG windows pallas (±2h)", st_egwin_pl),
                     ("SEG scalar", st_seg),
                     ("full fused precompute (iters=0)", st_pre),
                     ("full fused burst (iters=100)", st_full)):
        best, med = time_chained(st, x0)
        print(f"{name:36s} best {best*1e3:7.2f} ms  median "
              f"{med*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
