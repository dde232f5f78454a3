"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: momentum-space (FFT) backprop inner-iterations/sec at 256×256,
M=10, D=3, 5×5 kernels — the reference's hot training loop
(source/fft_backproplib.cu:1446: 100 iterations per keypress).

``vs_baseline``: the reference publishes no numbers (BASELINE.md).  The
denominator is a documented *estimate* of the reference GPU's inner-loop
rate: each iteration runs a gradient kernel over M·D·256·129 bins, four
full-size cuFFT execs, two conv kernels, a Thrust reduce with device→host
sync, and a console print, on an sm_50-class part — ≈100 it/s is a generous
estimate (≥10 ms/iter).  The north-star target is ≥10× that (BASELINE.json).

Timing methodology (validated on this rig): each timed call's input is a
function of the previous call's output, so calls can neither be deduplicated
by the execution relay (which caches repeated (executable, args) and reports
~0 ms) nor overlapped; the chain is timed end-to-end with one final blocking
fetch and divided by N.  Everything timed is jitted — eager dispatch over the
axon tunnel does not represent TPU performance.

Headline reproducibility: the headline row is measured in FIVE
time-separated windows spread across the run (minutes apart, so no single
bad ~1 s tunnel period poisons the judged number).  The driver-parsed
``value`` is the MEDIAN of the window floors — reproducible by construction;
the per-window floors and medians ship alongside, with ``spread_pct`` the
(max−min)/median band of the individual windows.

Utilization: every row carries a roofline entry (``util[...]`` keys) —
FLOPs and bytes from XLA's cost analysis of the compiled program
(spectralae/core/roofline.py), plus the analytic Pallas-kernel supplement
for the fused ≥2048² bursts, against the chip's public peaks.  This is the
"util" cell the reference never had (SURVEY.md §6).

Tiers: the default run includes every BASELINE.md row (the 2048²–8192²
fused bursts, the all-pairs sweep, coord/DP streaming, M=50, 13×13) —
driver-reproducible by construction.  ``--quick`` keeps only the headline
windows and the small-config rows.

Extended results go to bench_details.json (written incrementally, so a
late-row failure cannot lose the completed rows).
"""

import argparse
import json
import os
import platform
import sys
import time
from typing import NamedTuple

import numpy as np

# per-process input nonce: chains must differ not only between trials but
# between *runs* — the execution relay caches (executable, args) across
# processes, and a repeated run with identical seeded inputs times ~0
# (observed on the coord-conv rows)
_NONCE = np.float32((os.getpid() % 9973) * 1e-7 + (time.time() % 1) * 1e-5)

import jax
import jax.numpy as jnp

from spectralae.core.runtime import enable_compilation_cache

enable_compilation_cache()

from spectralae.core import roofline
from spectralae.core.config import Config, LayerParams
from spectralae.core.types import initial_spec, init_params, init_opt_state
from spectralae.model import autoencoder as model
from spectralae.train.fft import fft_burst
from spectralae.train.fft_corr import fft_burst_corr
from spectralae.train.fft_iter import fft_burst_itergrid
from spectralae.train.fft_pallas import (fft_burst_pallas,
                                          fft_burst_pallas_fused)
from spectralae.train.coord import coord_step
from spectralae.train.modern import train_step

REFERENCE_FFT_ITERS_PER_SEC_ESTIMATE = 100.0

PEAKS = roofline.device_peaks()


def _fetch_scalar(arr) -> float:
    """Force a real device→host value fetch — the only true sync point on
    this rig (block_until_ready can return before remote execution ends)."""
    return float(jnp.sum(arr))


# Tunnel measurement floor: the relay's round-trip resolution is ~0.02 ms
# per call — any per-call time below this after the long-chain retry means
# the chain was swallowed (relay dedup / overlap) and the row is garbage,
# not a measurement.  Round-2 shipped a 1.56e-8 s "conv" row (a 42-million-x
# "speedup"); rows below the floor are now DISCARDED, never persisted.
FLOOR_S = 2e-5


class Timing(NamedTuple):
    best: float     # floor of the trial chains (device-time estimate)
    median: float   # median trial (reproducible headline basis)
    valid: bool     # False => below the tunnel floor even after retry


def time_chained(step, x0, n=20, warmup=1, trials=5,
                 live_chain=False) -> Timing:
    """Seconds/call for ``step(x) -> (result, next_x)`` chains of length n.

    The chain's data dependency forces sequential execution; the final value
    fetch forces completion of every link.  The fetch round-trip latency is
    measured on a no-op and subtracted.  Returns the floor AND the median of
    ``trials`` chains — tunnel latency varies run to run; the floor reflects
    device time, the median is what a re-run reproduces.

    ``live_chain``: consume-mode for HBM-critical shapes — the caller passes
    ``[x0]`` (a 1-element list) and drops its own reference; every trial's
    (still distinct) chain input derives from the previous trial's live
    output instead of re-offsetting a retained base buffer.  Exactly ONE
    resolution-sized signal buffer stays alive across trials: the 16384²
    fused burst peaks at ~12.9 of 16 GB HBM, so a second 3.2 GB base buffer
    is the difference between fitting and ResourceExhausted."""
    if live_chain:
        x = x0.pop()
        x0 = None
    else:
        x = x0
    for _ in range(warmup):
        r, x = step(x)
    _fetch_scalar(x)
    live = {"x": x if live_chain else None}

    def run_chains(n_links, base_off=0.0):
        samples = []
        for trial in range(trials):
            # distinct chain per trial AND per process — a repeated chain
            # would be deduplicated by the relay and time ~0
            if live_chain:
                x = live["x"] + (trial + 1) * 1e-5 + base_off + _NONCE
                live["x"] = None
            else:
                x = x0 + (trial + 1) * 1e-5 + base_off + _NONCE
            # force the eager chain-input op off the clock: fetching a
            # cold x folds its materialization into fetch_rt, and under
            # host CPU load that overshoot exceeded whole short chains
            # (total − fetch_rt went negative and valid rows were
            # discarded as sub-floor)
            _fetch_scalar(x)
            t0 = time.perf_counter()
            _fetch_scalar(x)
            fetch_rt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(n_links):
                r, x = step(x)
            _fetch_scalar(x)
            total = time.perf_counter() - t0
            samples.append(max(total - fetch_rt, 1e-9) / n_links)
            if live_chain:
                live["x"] = x
        return samples

    def keep(samples):
        # tunnel noise is strictly additive, so genuine samples only ever
        # sit ABOVE device time; sub-floor values are calibration/dedup
        # artifacts of that one trial — drop them, not the whole row
        return [s for s in samples if s >= FLOOR_S]

    samples = run_chains(n)
    good = keep(samples)
    if not good:
        # every trial below the tunnel's measurement resolution — retry
        # amortized over a much longer chain.  Offset the retry's base
        # input past the first pass's trial offsets: a retry reusing the
        # same chain starts replays n already-served (executable, args)
        # pairs per chain from the relay cache, deflating per-link time
        # by ~n/(8n) and potentially re-discarding a genuinely valid row
        samples = run_chains(n * 8, base_off=6.6e-5)
        good = keep(samples)
    if not good:
        return Timing(best=min(samples), median=float(np.median(samples)),
                      valid=False)
    return Timing(best=min(good), median=float(np.median(good)),
                  valid=True)


class Bench:
    """Row recorder: timings + roofline utilization, flushed to
    bench_details.json after every row."""

    def __init__(self, path="bench_details.json"):
        self.results = {}
        self.path = path

    def flush(self):
        with open(self.path, "w") as f:
            json.dump(self.results, f, indent=2)

    def record(self, timing: Timing, ms_key: str, rate_key: str | None = None,
               rate_num: float = 1.0, cost=None, analytic_bytes=None):
        """Persist a timing row, or discard it loudly if it failed
        validation.

        Invalid rows are written as ``null`` with the key appended to
        ``results["discarded"]`` — a physically-impossible number must never
        masquerade as a measurement.  ``cost``: optional (flops, bytes) for
        the roofline entry (util[ms_key]); computed against the row's floor
        time (the device-time estimate).

        Physicality guard: a floor that implies more FLOP/s than the
        chip's dense bf16 peak cannot be a measurement (it is a relay
        dedup/calibration artifact that slipped past FLOOR_S) — the row
        is re-based on the median and the bogus floor kept under a
        ``:floor_discarded_ms`` key.  A ``pct_peak_bw`` > 100 after
        that is XLA's bytes-accessed overcounting fused handovers: the
        entry is marked ``bytes_overcounted`` and, when the caller
        passes an ``analytic_bytes`` bound (roofline.*_bytes), the
        physical percentage is reported alongside.  Returns the basis
        seconds (truthy) or None."""
        results = self.results
        if not timing.valid:
            results[ms_key] = None
            if rate_key:
                results[rate_key] = None
            results.setdefault("discarded", []).append(ms_key)
            print(f"# DISCARDED {ms_key}: {timing.best*1e3:.6f} ms is below "
                  f"the {FLOOR_S*1e3:.2f} ms tunnel floor even after the "
                  "long-chain retry", file=sys.stderr)
            self.flush()
            return None
        basis = timing.best
        if (cost is not None and cost[0] and PEAKS
                and cost[0] / basis > PEAKS.flops
                and cost[0] / timing.median <= PEAKS.flops):
            basis = timing.median
            results[ms_key + ":floor_discarded_ms"] = timing.best * 1e3
            results[ms_key + ":note"] = (
                "floor implies >peak FLOP/s (relay artifact) — row "
                "re-based on the median")
            print(f"# NONPHYSICAL FLOOR {ms_key}: {timing.best*1e3:.4f} ms "
                  f"implies {cost[0]/timing.best/1e12:.0f} TFLOP/s — using "
                  f"the median {timing.median*1e3:.4f} ms", file=sys.stderr)
        results[ms_key] = basis * 1e3
        results[ms_key + ":median"] = timing.median * 1e3
        if rate_key:
            results[rate_key] = rate_num / basis
        if cost is not None and (cost[0] is not None or cost[1] is not None):
            util = roofline.utilization(cost[0], cost[1], basis, PEAKS)
            if PEAKS and util.get("pct_peak_flops", 0) > 100:
                util["flops_overcounted"] = True
            if PEAKS and util.get("pct_peak_bw", 0) > 100:
                util["bytes_overcounted"] = True
            if analytic_bytes is not None and PEAKS:
                util["analytic_gb"] = round(analytic_bytes / 1e9, 3)
                util["pct_peak_bw_analytic"] = round(
                    100.0 * analytic_bytes / basis / PEAKS.hbm, 2)
            results[f"util[{ms_key}]"] = util
        self.flush()
        return basis

    def fail(self, key: str, err: Exception):
        """A row whose program could not compile/run on this chip — record
        the failure reason instead of silently skipping (the 16384² wall)."""
        msg = f"{type(err).__name__}: {err}"
        self.results[key] = None
        self.results[key + ":error"] = msg[:400]
        print(f"# FAILED {key}: {msg[:200]}", file=sys.stderr)
        self.flush()


def _versions():
    import jaxlib
    v = {"python": platform.python_version(),
         "jax": jax.__version__, "jaxlib": jaxlib.__version__,
         "numpy": np.__version__}
    try:
        import libtpu
        v["libtpu"] = getattr(libtpu, "__version__", "present")
    except ImportError:
        pass
    try:
        import optax
        v["optax"] = optax.__version__
    except ImportError:
        pass
    return v


def scaled(cost, k):
    """Scale a scan-over-frames row's cost by the trip count (XLA costs
    while bodies once; see roofline.compiled_cost)."""
    fl, by = cost
    return (fl * k if fl is not None else None,
            by * k if by is not None else None)


def burst_cost(x, out0, enc, dec, iters, fused_pallas=False, batch=1,
               pallas_windows=None):
    """(flops, bytes) for an fft_burst_corr row: XLA cost analysis plus the
    analytic supplements for the Pallas anchor kernel (opaque to XLA) and
    the inner fori_loop's per-iteration arithmetic (while bodies are
    costed once).  ``pallas_windows`` must match the timed row's variant
    (the compiled program differs)."""
    fl, by = roofline.compiled_cost(
        fft_burst_corr, x, None, out0, enc.c, dec.c, enc.b, dec.b,
        lr=0.2, iters=iters, pallas_windows=pallas_windows)
    if fl is not None:
        M, D, nk, nl = enc.c.shape
        fl += roofline.corr_iter_flops(D, M, nk, nl, iters)
        if fused_pallas:
            nx, ny = x.shape[-2], x.shape[-1]
            kfl, _ = roofline.anchor_windows_cost(
                batch, D, nx, ny, 2 * (nk // 2), 2 * (nl // 2),
                signal_bytes=(2 if pallas_windows in ("bf16", "fft-bf16")
                              else 4))
            fl += kfl   # kernel HBM traffic (the X read) is already in
            #             the custom call's operand bytes — arithmetic only
    return fl, by


def xl_row(bench: "Bench", variant: str = "fused"):
    """The 16384² (268 MP) burst row — the largest single-frame config
    that fits single-chip (peaks at ~12.9 of 16 GB HBM).

    MUST run in a fresh process: a full-run attempt measured exactly the
    two failure modes process isolation removes — (a) allocator state
    from the preceding ~40 rows turns the otherwise-fitting burst into
    ResourceExhausted, and (b) on this backend a device-side
    ResourceExhausted poisons the process (every later allocation fails,
    killing the remaining rows).  ``--xl`` therefore dispatches this row
    to ``--xl-child`` subprocesses — one per variant, so an OOM in one
    variant is recorded as that row's failure note and nothing else —
    and merges their JSON into bench_details.json.

    variants: ``fused`` (XLA FFT + f32 Pallas anchor — the round-4
    record config; its ~12.9 GB peak is a fit-or-OOM coin flip against
    the chip's usable HBM, so a recorded OOM here is a measurement),
    ``bf16`` (XLA FFT + bf16 plane streaming — ~1.6 GB lower peak, the
    robust 268 MP row), and ``pallas-fft-bf16`` (the radix-4 four-step
    rfft2 + bf16 streaming that wins 1.39× at 8192²; at 16384²
    ``lead_chunk`` bottoms out at one plane per chunk, so whether its
    recursion transients fit is exactly what this row measures — a
    recorded OOM is the tightened wall).
    """
    nxy, burst_iters = 16384, 100
    rng = np.random.default_rng(0)
    cfgN = Config(nx=nxy, ny=nxy, d=3,
                  layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                    rmax=3.0))
    paramsN = init_params(jax.random.key(0), initial_spec(cfgN), 1.0)
    encN, decN = paramsN.pair(0)
    suffix = "" if variant == "fused" else f"[{variant}]"
    key = f"fft_burst_100_ms_{nxy}{suffix}"
    pw = {"fused": None, "bf16": "bf16",
          "pallas-fft-bf16": "fft-bf16"}[variant]
    try:
        xN = jax.device_put(rng.standard_normal(
            size=(3, nxy, nxy), dtype=np.float32) * 50)

        def burst_n(x, e=encN, d_=decN):
            r = fft_burst_corr(x, None, None, e.c, d_.c, e.b, d_.b,
                               lr=0.2, iters=burst_iters,
                               pallas_windows=pw)
            return r, x + r.mses[-1] * 0.0 + 1e-6
        # consume-mode: a second retained base buffer OOMs, so the timer
        # chains trials from its one live value and the cost row lowers
        # from an abstract ShapeDtypeStruct (compile-cache hit; no array)
        holder = [xN]
        xN = jax.ShapeDtypeStruct((3, nxy, nxy), np.float32)
        timing = time_chained(burst_n, holder, n=1, trials=3,
                              live_chain=True)
        bench.record(timing, key, f"fft_backprop_iters_per_sec_{nxy}"
                     + suffix, burst_iters,
                     cost=burst_cost(xN, None, encN, decN, burst_iters,
                                     fused_pallas=True,
                                     pallas_windows=pw))
    except Exception as e:      # noqa: BLE001 — record the wall
        bench.fail(key, e)


_XL_VARIANTS = ("fused", "bf16", "pallas-fft-bf16")


def _run_xl_children(bench: "Bench"):
    """Dispatch one --xl-child subprocess per 16384² variant and merge
    each child's row keys.  Runs before the parent touches big buffers;
    the child sees a fresh allocator either way.  Flushed per child, and
    a hung child (wedged device tunnel) becomes that row's error note —
    the remaining variants and the whole parent tier still run."""
    import subprocess
    import tempfile
    for variant in _XL_VARIANTS:
        with tempfile.NamedTemporaryFile(
                mode="r", suffix=".json", prefix="bench_xl_",
                delete=False) as tf:
            out = tf.name
        print(f"# --xl: 16384² [{variant}] in a fresh child process "
              "(clean HBM; Mosaic compile is minutes cold)",
              file=sys.stderr, flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--xl-child", out,
                 "--xl-variant", variant],
                capture_output=True, text=True, timeout=3600)
            rc, err = proc.returncode, proc.stderr or ""
        except subprocess.TimeoutExpired as e:
            rc, err = "timeout", str(e)
        try:
            with open(out) as f:
                child = json.load(f)
        except Exception:           # noqa: BLE001
            child = {}
        if not child or rc != 0:
            key = ("fft_burst_100_ms_16384" if variant == "fused"
                   else f"fft_burst_100_ms_16384[{variant}]")
            child.setdefault(key, None)
            child[key + ":error"] = f"child exited {rc}: " + err[-300:]
        bench.results.update(child)
        bench.flush()
        os.unlink(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="headline windows + small-config rows only "
                         "(skip the ≥2048² bursts / sweep / streaming tier)")
    ap.add_argument("--xl", action="store_true",
                    help="add the 16384² (268 MP) burst rows (fused + "
                         "pallas-fft-bf16), each in an isolated child "
                         "process — adds minutes of Mosaic compile "
                         "(cold) on top of the full run")
    ap.add_argument("--xl-child", metavar="OUT", help=argparse.SUPPRESS)
    ap.add_argument("--xl-variant", default="fused",
                    choices=_XL_VARIANTS, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.xl_child:
        xl_row(Bench(path=args.xl_child), args.xl_variant)
        return

    bench = Bench()
    results = bench.results
    results["versions"] = _versions()
    results["device"] = str(jax.devices()[0])
    if PEAKS:
        results["peaks"] = {"chip": PEAKS.name,
                            "bf16_tflops": PEAKS.flops / 1e12,
                            "hbm_gbps": PEAKS.hbm / 1e9}

    if args.xl and not args.quick:
        # before the parent allocates anything resolution-sized: the
        # children need the chip's full 16 GB (see xl_row docstring)
        _run_xl_children(bench)

    rng = np.random.default_rng(0)
    cfg = Config(nx=256, ny=256, d=3,
                 layer=LayerParams(depth=10, lk=1, ll=1, scale=2, rmax=3.0))
    spec = initial_spec(cfg)
    spec3 = spec.add_pair(cfg.layer).add_pair(cfg.layer)
    params1 = init_params(jax.random.key(0), spec, 1.0)
    params3 = init_params(jax.random.key(0), spec3, 1.0)

    def frame(b=None):
        shape = (3, 256, 256) if b is None else (b, 3, 256, 256)
        return jax.device_put(rng.normal(size=shape).astype(np.float32) * 50)

    # ---- headline: FFT backprop burst at 256×256 (stage pair 0) ----
    enc, dec = params1.pair(0)
    fwd1 = jax.jit(lambda p, x: model.forward_fft(p, x, spec.scales))
    x0 = frame()
    out0 = fwd1(params1, x0[None])[0]
    burst_iters = 100

    impls = {
        "corr": lambda x: fft_burst_corr(
            x, None, out0, enc.c, dec.c, enc.b, dec.b, lr=0.2,
            iters=burst_iters),
        "pallas-fused": lambda x: fft_burst_pallas_fused(
            x, x, out0, enc.c, dec.c, enc.b, dec.b, lr=0.2,
            iters=burst_iters),
        "pallas": lambda x: fft_burst_pallas(
            x, x, out0, enc.c, dec.c, enc.b, dec.b, lr=0.2,
            iters=burst_iters),
        "itergrid": lambda x: fft_burst_itergrid(
            x, x, out0, enc.c, dec.c, enc.b, dec.b, lr=0.2,
            iters=burst_iters),
        "dft": lambda x: fft_burst(
            x, x, out0, enc.c, dec.c, enc.b, dec.b, lr=0.2,
            iters=burst_iters, impl="dft"),
        "fft": lambda x: fft_burst(
            x, x, out0, enc.c, dec.c, enc.b, dec.b, lr=0.2,
            iters=burst_iters, impl="fft"),
    }
    headline_floor, headline_median = {}, {}

    # --- window 1: all implementations ---
    for impl, fn in impls.items():
        def burst_step(x, fn=fn):
            r = fn(x)
            return r, x + r.mses[-1] * 0.0 + 1e-6
        t = time_chained(burst_step, x0)
        cost = (burst_cost(x0, out0, enc, dec, burst_iters)
                if impl == "corr" else None)
        if bench.record(t, f"fft_burst_100_ms[{impl}]",
                        f"fft_backprop_iters_per_sec_256[{impl}]",
                        burst_iters, cost=cost):
            results[f"fft_backprop_iters_per_sec_256_median[{impl}]"] = \
                burst_iters / t.median
            if impl in ("corr", "pallas-fused", "pallas", "dft"):
                headline_floor[impl] = burst_iters / t.best
                headline_median[impl] = burst_iters / t.median
    best_impl = (max(headline_floor, key=headline_floor.get)
                 if headline_floor else None)
    windows_floor, windows_median = [], []
    if best_impl:
        windows_floor.append(headline_floor[best_impl])
        windows_median.append(headline_median[best_impl])

    def headline_window(tag, base_off):
        """Re-measure the fastest impl in a fresh, time-separated window.
        Each window's chains get a disjoint base offset so no (executable,
        args) pair repeats — a relay-cached repeat times ~0."""
        if not best_impl:
            return
        def step(x, fn=impls[best_impl]):
            r = fn(x)
            return r, x + r.mses[-1] * 0.0 + 1e-6
        t = time_chained(step, x0 + base_off)
        if t.valid:
            windows_floor.append(burst_iters / t.best)
            windows_median.append(burst_iters / t.median)
            results[f"headline_window[{tag}]"] = {
                "floor_iters_per_sec": burst_iters / t.best,
                "median_iters_per_sec": burst_iters / t.median}
            bench.flush()

    # ---- 400-iteration burst: amortizes the one-time correlation
    # precompute (the corr burst's per-iteration cost is resolution- and
    # batch-independent) ----
    def burst400(x):
        r = fft_burst_corr(x, None, out0, enc.c, dec.c, enc.b, dec.b,
                           lr=0.2, iters=400)
        return r, x + r.mses[-1] * 0.0 + 1e-6
    bench.record(time_chained(burst400, x0, n=10),
                 "fft_burst_400_ms[corr]",
                 "fft_backprop_iters_per_sec_256_x400", 400,
                 cost=burst_cost(x0, out0, enc, dec, 400))

    # ---- streaming: 32-frame × 100-iter on-device scan (one dispatch
    # per stream; per-frame fused re-anchoring — train/streaming.py) ----
    from spectralae.train.streaming import fft_stream
    xs32 = jax.device_put(
        rng.normal(size=(32, 3, 256, 256)).astype(np.float32) * 50)

    def stream_step(xs):
        r = fft_stream(xs, enc.c, dec.c, enc.b, dec.b, iters=100)
        return r, xs + r.mses[-1, -1] * 0.0 + 1e-6
    bench.record(time_chained(stream_step, xs32, n=3, trials=5),
                 "fft_stream_32x100_ms",
                 "fft_stream_iters_per_sec_sustained", 32 * 100,
                 cost=scaled(roofline.compiled_cost(
                     fft_stream, xs32, enc.c, dec.c, enc.b, dec.b,
                     iters=100), 32))

    # --- window 6 (interleaved: more windows tighten the median's IQR) ---
    headline_window("w6", 38.8e-5)

    # ---- headline at 512² and 1024² (scaling) ----
    for nxy, nlinks in ((512, 10), (1024, 8)):
        cfgB = Config(nx=nxy, ny=nxy, d=3,
                      layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                        rmax=3.0))
        specB = initial_spec(cfgB)
        paramsB = init_params(jax.random.key(0), specB, 1.0)
        encB, decB = paramsB.pair(0)
        fwdB = jax.jit(lambda p, x, s=specB.scales:
                       model.forward_fft(p, x, s))
        xb0 = jax.device_put(
            rng.normal(size=(3, nxy, nxy)).astype(np.float32) * 50)
        outB = fwdB(paramsB, xb0[None])[0]

        def burst_big(x, o=outB, e=encB, d_=decB):
            r = fft_burst_corr(x, None, o, e.c, d_.c, e.b, d_.b, lr=0.2,
                               iters=burst_iters)
            return r, x + r.mses[-1] * 0.0 + 1e-6
        bench.record(time_chained(burst_big, xb0, n=nlinks),
                     f"fft_burst_100_ms_{nxy}",
                     f"fft_backprop_iters_per_sec_{nxy}", burst_iters,
                     cost=burst_cost(xb0, outB, encB, decB, burst_iters),
                     analytic_bytes=roofline.corr_burst_bytes(
                         1, 3, nxy, nxy, fused=False))

    # --- window 2 ---
    headline_window("w2", 7.7e-5)

    # ---- ≥2048² fused-anchor bursts: 2048² (4.2 MP) / 4096² (16.8 MP) /
    # 8192² (67 MP).  At these sizes the precompute auto-routes through
    # the single-pass Pallas anchor kernel (ops/pallas_windows.
    # anchor_windows); above 2048² the wrapper's ω_y chunking keeps
    # Mosaic's scoped-VMEM working set bounded.  The 16384² (268 MP) row
    # rides behind --xl in an ISOLATED child process — see xl_row(). ----
    big_sizes = [2048] if args.quick else [2048, 4096, 8192]
    for nxy in big_sizes:
        cfgN = Config(nx=nxy, ny=nxy, d=3,
                      layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                        rmax=3.0))
        paramsN = init_params(jax.random.key(0), initial_spec(cfgN), 1.0)
        encN, decN = paramsN.pair(0)
        key = f"fft_burst_100_ms_{nxy}"
        try:
            xN = jax.device_put(rng.standard_normal(
                size=(3, nxy, nxy), dtype=np.float32) * 50)

            def burst_n(x, e=encN, d_=decN):
                r = fft_burst_corr(x, None, None, e.c, d_.c, e.b, d_.b,
                                   lr=0.2, iters=burst_iters)
                return r, x + r.mses[-1] * 0.0 + 1e-6
            nlinks = {2048: 5, 4096: 3, 8192: 2}[nxy]
            timing = time_chained(burst_n, xN, n=nlinks,
                                  trials=3 if nxy > 2048 else 5)
            bench.record(timing,
                         key, f"fft_backprop_iters_per_sec_{nxy}",
                         burst_iters,
                         cost=burst_cost(xN, None, encN, decN, burst_iters,
                                         fused_pallas=True))
            del xN
        except Exception as e:      # noqa: BLE001 — record the wall
            bench.fail(key, e)

    # ---- 2048² with bf16 signal streaming through the Pallas anchor:
    # the fused burst's HBM traffic is dominated by the split re/im
    # signal planes; bf16 storage halves the kernel read and the split
    # write (f32 accumulation in-kernel — equality/convergence pinned in
    # tests/test_fft_corr.py::test_corr_burst_bf16_pixel_scale) ----
    if not args.quick:
        cfg2b = Config(nx=2048, ny=2048, d=3,
                       layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                         rmax=3.0))
        params2b = init_params(jax.random.key(0), initial_spec(cfg2b), 1.0)
        enc2b, dec2b = params2b.pair(0)
        x2b = jax.device_put(
            rng.normal(size=(3, 2048, 2048)).astype(np.float32) * 50)

        def burst_2k_bf16(x, e=enc2b, d_=dec2b):
            r = fft_burst_corr(x, None, None, e.c, d_.c, e.b, d_.b,
                               lr=0.2, iters=burst_iters,
                               pallas_windows="bf16")
            return r, x + r.mses[-1] * 0.0 + 1e-6
        try:
            fl2b, by2b = roofline.compiled_cost(
                fft_burst_corr, x2b, None, None, enc2b.c, dec2b.c, enc2b.b,
                dec2b.b, lr=0.2, iters=burst_iters, pallas_windows="bf16")
            if fl2b is not None:
                fl2b += roofline.corr_iter_flops(3, 10, 5, 5, burst_iters)
                fl2b += roofline.anchor_windows_cost(1, 3, 2048, 2048, 4, 4,
                                                     signal_bytes=2)[0]
            bench.record(time_chained(burst_2k_bf16, x2b, n=5),
                         "fft_burst_100_ms_2048[bf16]",
                         "fft_backprop_iters_per_sec_2048[bf16]",
                         burst_iters, cost=(fl2b, by2b))
        except Exception as e:      # noqa: BLE001 — Mosaic VMEM limits
            bench.fail("fft_burst_100_ms_2048[bf16]", e)

        # ---- 2048²/4096² with the Pallas radix-4 four-step rfft2
        # replacing XLA's FFT custom-call for the signal transform (the
        # ~75 % cost of the fused burst at these sizes —
        # ops/pallas_fft.py; spectra stay in mixed bin order, the anchor
        # kernel permutes its constants) + bf16 plane streaming.  The
        # FFT kernel alone is 4.6× XLA at 2048² but the burst win needs
        # BOTH pieces: measured 2048² fused 4.05→2.86 ms, 4096²
        # 19.9→16.3 ms, while fused-fft (f32) and fused-bf16 (XLA FFT)
        # each tie the baseline.  8192²: the three channel planes'
        # concurrent wrapper-recursion transients OOMed HBM (22.8 vs
        # 15.75 G) until rfft2_mixed grew lead_chunk (lax.map over
        # planes — fft_corr auto-sets it ≥8192²); measured 79.4→57.2 ms
        # same-window.  CLI: --pallas-fft --bf16; equality pinned by
        # tests/test_pallas_fft.py + tests/test_fft_corr.py::
        # test_fft_mode_burst_matches_spectral /
        # test_fft_bf16_mode_burst_converges_at_pixel_scale ----
        def pallas_fft_row(nxy, x, enc, dec, nlinks, trials):
            key = f"fft_burst_100_ms_{nxy}[pallas-fft-bf16]"

            def burst_pfft(xx, e=enc, d_=dec):
                r = fft_burst_corr(xx, None, None, e.c, d_.c, e.b, d_.b,
                                   lr=0.2, iters=burst_iters,
                                   pallas_windows="fft-bf16")
                return r, xx + r.mses[-1] * 0.0 + 1e-6
            try:
                flp, byp = roofline.compiled_cost(
                    fft_burst_corr, x, None, None, enc.c, dec.c, enc.b,
                    dec.b, lr=0.2, iters=burst_iters,
                    pallas_windows="fft-bf16")
                if flp is not None:
                    flp += roofline.corr_iter_flops(3, 10, 5, 5,
                                                    burst_iters)
                    ffl, fby = roofline.pallas_rfft2_cost(1, 3, nxy, nxy,
                                                          out_bytes=2)
                    afl, aby = roofline.anchor_windows_cost(
                        1, 3, nxy, nxy, 4, 4, signal_bytes=2)
                    flp += ffl + afl
                    byp += fby + aby
                bench.record(
                    time_chained(burst_pfft, x, n=nlinks, trials=trials),
                    key, f"fft_backprop_iters_per_sec_{nxy}"
                    "[pallas-fft-bf16]", burst_iters, cost=(flp, byp))
            except Exception as e:  # noqa: BLE001
                bench.fail(key, e)

        pallas_fft_row(2048, x2b, enc2b, dec2b, nlinks=5, trials=5)
        del x2b
        cfg4p = Config(nx=4096, ny=4096, d=3,
                       layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                         rmax=3.0))
        params4p = init_params(jax.random.key(0), initial_spec(cfg4p), 1.0)
        enc4p, dec4p = params4p.pair(0)
        x4p = jax.device_put(
            rng.normal(size=(3, 4096, 4096)).astype(np.float32) * 50)
        pallas_fft_row(4096, x4p, enc4p, dec4p, nlinks=3, trials=3)
        del x4p
        cfg8p = Config(nx=8192, ny=8192, d=3,
                       layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                         rmax=3.0))
        params8p = init_params(jax.random.key(0), initial_spec(cfg8p), 1.0)
        enc8p, dec8p = params8p.pair(0)
        x8p = jax.device_put(
            rng.normal(size=(3, 8192, 8192)).astype(np.float32) * 50)
        pallas_fft_row(8192, x8p, enc8p, dec8p, nlinks=2, trials=3)
        del x8p

        # ---- streaming @2048²: 4-frame × 100-iter on-device scan of the
        # fused Pallas-anchor burst (weights+momentum carried; the scan's
        # win at this size is composition — one jit for the stream —
        # pinned by tests/test_pallas_windows.py::
        # test_scan_of_pallas_precompute) ----
        xs2k = jax.device_put(
            rng.normal(size=(4, 3, 2048, 2048)).astype(np.float32) * 50)

        def stream2k_step(xs, e=enc2b, d_=dec2b):
            r = fft_stream(xs, e.c, d_.c, e.b, d_.b, iters=100)
            return r, xs + r.mses[-1, -1] * 0.0 + 1e-6
        try:
            bench.record(time_chained(stream2k_step, xs2k, n=2, trials=3),
                         "fft_stream_2048_4x100_ms",
                         "fft_stream_2048_iters_per_sec_sustained", 4 * 100,
                         cost=scaled(roofline.compiled_cost(
                             fft_stream, xs2k, enc2b.c, dec2b.c, enc2b.b,
                             dec2b.b, iters=100), 4))
        except Exception as e:      # noqa: BLE001
            bench.fail("fft_stream_2048_4x100_ms", e)

        # same stream with the Pallas rfft2 + bf16 planes feeding each
        # per-frame re-anchoring (the production large-N stream path:
        # CLI `--mode stream --pallas-fft --bf16`)
        def stream2k_pfft(xs, e=enc2b, d_=dec2b):
            r = fft_stream(xs, e.c, d_.c, e.b, d_.b, iters=100,
                           pallas_windows="fft-bf16")
            return r, xs + r.mses[-1, -1] * 0.0 + 1e-6
        try:
            # scan bodies are costed once by XLA — scale by the 4-frame
            # trip count, matching the baseline fft_stream_2048 row
            fls, bys = scaled(roofline.compiled_cost(
                fft_stream, xs2k, enc2b.c, dec2b.c, enc2b.b, dec2b.b,
                iters=100, pallas_windows="fft-bf16"), 4)
            if fls is not None:
                ffl, fby = roofline.pallas_rfft2_cost(1, 3, 2048, 2048,
                                                      out_bytes=2)
                afl, aby = roofline.anchor_windows_cost(
                    1, 3, 2048, 2048, 4, 4, signal_bytes=2)
                fls += 4 * (ffl + afl + roofline.corr_iter_flops(
                    3, 10, 5, 5, 100))
                bys += 4 * (fby + aby)
            bench.record(time_chained(stream2k_pfft, xs2k, n=2, trials=3),
                         "fft_stream_2048_4x100_ms[pallas-fft-bf16]",
                         "fft_stream_2048_iters_per_sec_sustained"
                         "[pallas-fft-bf16]", 4 * 100, cost=(fls, bys))
        except Exception as e:      # noqa: BLE001
            bench.fail("fft_stream_2048_4x100_ms[pallas-fft-bf16]", e)
        del xs2k

    # --- window 3: after the big-burst tier ---
    headline_window("w3", 15.5e-5)

    # ---- forward passes, 3-layer net, batch 1 ----
    fwd_fft3 = jax.jit(lambda x: model.forward_fft(params3, x, spec3.scales))

    def fwd_fft_step(x):
        out = fwd_fft3(x)
        return out, x + out * 1e-9
    x1 = frame(b=1)
    bench.record(time_chained(fwd_fft_step, x1),
                 "forward_fft_3layer_256_ms", "forward_fft_3layer_256_fps",
                 1.0, cost=roofline.compiled_cost(fwd_fft3, x1))

    fwd_coord3 = jax.jit(
        lambda x: model.forward_coord(params3, x, spec3.scales)[-1])

    def fwd_coord_step(x):
        out = fwd_coord3(x)
        return out, x + out * 1e-9
    bench.record(time_chained(fwd_coord_step, frame(b=1)),
                 "forward_coord_3layer_256_ms",
                 cost=roofline.compiled_cost(fwd_coord3, x1))

    # ---- coordinate-space reference train step (pair 0, full frame) ----
    acts = jax.jit(lambda x: model.forward_coord(
        params1, x, spec.scales, tap_mode="ref_gpu"))(x0[None])
    mom = tuple(jnp.zeros_like(t) for t in (enc.c, dec.c, enc.b, dec.b))
    hin = acts[2][0]
    outp = acts[-2][0]

    def cstep(in_s):
        r = coord_step(in_s, outp, hin, enc.c, dec.c, enc.b, dec.b,
                       mom, mom, lr=0.2)
        return r, in_s + r.mse * 0.0 + 1e-6
    xc = jax.device_put(
        rng.normal(size=(3, 128, 128)).astype(np.float32) * 50)
    bench.record(time_chained(cstep, xc),
                 "coord_step_128_ms", "coord_steps_per_sec", 1.0,
                 cost=roofline.compiled_cost(
                     coord_step, xc, outp, hin, enc.c, dec.c, enc.b,
                     dec.b, mom, mom, lr=0.2))

    # --- window 7 ---
    headline_window("w7", 46.6e-5)

    # ---- modern batched train step (3-layer, batch 8, fft domain) ----
    opt3 = init_opt_state(params3)

    def mstep(x):
        r = train_step(params3, opt3, x, spec3.scales, lr=0.2, domain="fft")
        return r, x + r.loss * 0.0 + 1e-6
    x8 = frame(b=8)
    bench.record(time_chained(mstep, x8, n=5),
                 "modern_fft_step_b8_ms", "modern_fft_frames_per_sec", 8.0,
                 cost=roofline.compiled_cost(
                     train_step, params3, opt3, x8, spec3.scales, lr=0.2,
                     domain="fft"),
                 analytic_bytes=roofline.fft_step_bytes(8, 3, 10, 256, 256,
                                                        pairs=3))

    # ---- data-parallel burst throughput (8 frames, one shared pair) ----
    from spectralae.train.fft_dp import fft_burst_dp

    def dp_step(x):
        r = fft_burst_dp(x, None, out8, enc.c, dec.c, enc.b, dec.b,
                         lr=0.2, iters=100)
        return r, x + r.mses[-1] * 0.0 + 1e-6
    out8 = fwd1(params1, x8)
    bench.record(time_chained(dp_step, x8, n=5),
                 "fft_burst_dp_b8_100_ms",
                 "fft_burst_dp_frame_iters_per_sec", 8 * 100,
                 cost=roofline.compiled_cost(
                     fft_burst_dp, x8, None, out8, enc.c, dec.c, enc.b,
                     dec.b, lr=0.2, iters=100))

    # ---- spectral-vs-coord conv speedup across kernel sizes ----
    # The reference's qualitative claim (README.md:5-6) quantified: one
    # M=10 conv layer at 256², coordinate (lax conv) vs momentum space
    # (rfft2 + pointwise complex conv + irfft2), batch 8.
    from spectralae.ops import coord as coord_ops
    from spectralae.ops import spectral as spectral_ops
    for lk in (1, 5, 15):   # 5×5, 13×13, 33×33 kernels
        nk = 2 * (lk + 1) + 1
        ck = jax.device_put(
            rng.normal(size=(10, 3, nk, nk)).astype(np.float32))
        bb = jax.device_put(rng.normal(size=(10,)).astype(np.float32))

        @jax.jit
        def conv_coord(x, ck=ck, bb=bb):
            return coord_ops.conv2d(x, ck, bb, tap_mode="centered",
                                    pallas=False)

        @jax.jit
        def conv_fftd(x, ck=ck, bb=bb):
            X = spectral_ops.rfft2(x)
            C = spectral_ops.kernel_rfft(ck, 256, 256)
            return spectral_ops.irfft2(
                spectral_ops.spectral_conv(X, C, bb, 256, 256), (256, 256))

        def step_c(x):
            out = conv_coord(x)
            return out, x + out[:, :3] * 1e-9

        def step_f(x):
            out = conv_fftd(x)
            return out, x + out[:, :3] * 1e-9
        tc = time_chained(step_c, frame(b=8), n=8)
        tf = time_chained(step_f, frame(b=8), n=8)
        ok_c = bench.record(tc, f"conv_coord_{nk}x{nk}_b8_ms",
                            cost=roofline.compiled_cost(conv_coord, x8))
        ok_f = bench.record(tf, f"conv_spectral_{nk}x{nk}_b8_ms",
                            cost=roofline.compiled_cost(conv_fftd, x8),
                            analytic_bytes=roofline.spectral_conv_bytes(
                                8, 3, 10, 256, 256))
        # the round-2 42-million-x row came from a ratio over a swallowed
        # chain — a speedup is only meaningful when both operands are real
        # (and computed on each row's recorded basis: record() re-bases a
        # floor that implies >peak FLOP/s on the median)
        results[f"spectral_speedup_{nk}x{nk}"] = (
            ok_c / ok_f if ok_c and ok_f else None)
        bench.flush()

        if nk == 5:
            # the VPU Pallas coord conv (ops/pallas_conv.py) — the
            # production route at ≤5×5 (conv2d auto): 1.28× over the lax
            # row AND exact f32 (the MXU conv's default precision is
            # bf16-rounded, ~2.4e-3 rel)
            @jax.jit
            def conv_pallas(x, ck=ck, bb=bb):
                return coord_ops.conv2d(x, ck, bb, tap_mode="centered",
                                        pallas=True)

            def step_p(x):
                out = conv_pallas(x)
                return out, x + out[:, :3] * 1e-9
            try:
                m_, d_ = ck.shape[0], ck.shape[1]
                fl_an = 2.0 * 8 * m_ * d_ * nk * nk * 256 * 256
                by_an = (8 * d_ * 256 * 256 + 8 * m_ * 256 * 256) * 4.0
                bench.record(time_chained(step_p, frame(b=8), n=8),
                             f"conv_coord_{nk}x{nk}_b8_ms[pallas]",
                             cost=(fl_an, by_an))
            except Exception as e:  # noqa: BLE001
                bench.fail(f"conv_coord_{nk}x{nk}_b8_ms[pallas]", e)

    # --- window 4 ---
    headline_window("w4", 23.3e-5)

    # ---- 512×512 deep config (BASELINE config 5), batch 4 ----
    cfg512 = Config(nx=512, ny=512, d=3,
                    layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                      rmax=3.0))
    spec512 = initial_spec(cfg512).add_pair(cfg512.layer).add_pair(
        cfg512.layer)
    params512 = init_params(jax.random.key(0), spec512, 1.0)
    opt512 = init_opt_state(params512)

    def mstep512(x):
        r = train_step(params512, opt512, x, spec512.scales, lr=0.2,
                       domain="fft")
        return r, x + r.loss * 0.0 + 1e-6
    x512 = jax.device_put(
        rng.normal(size=(4, 3, 512, 512)).astype(np.float32) * 50)
    bench.record(time_chained(mstep512, x512, n=5),
                 "modern_fft_step_512_b4_ms", "modern_fft_512_frames_per_sec",
                 4.0, cost=roofline.compiled_cost(
                     train_step, params512, opt512, x512, spec512.scales,
                     lr=0.2, domain="fft"),
                 analytic_bytes=roofline.fft_step_bytes(4, 3, 10, 512, 512,
                                                        pairs=3))

    # ---- 1024×1024 deep config, batch 2 (fused-conv scaling) ----
    cfg1k = Config(nx=1024, ny=1024, d=3,
                   layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                     rmax=3.0))
    spec1k = initial_spec(cfg1k).add_pair(cfg1k.layer).add_pair(cfg1k.layer)
    params1k = init_params(jax.random.key(0), spec1k, 1.0)
    opt1k = init_opt_state(params1k)

    def mstep1k(x):
        r = train_step(params1k, opt1k, x, spec1k.scales, lr=0.2,
                       domain="fft")
        return r, x + r.loss * 0.0 + 1e-6
    x1k = jax.device_put(
        rng.normal(size=(2, 3, 1024, 1024)).astype(np.float32) * 50)
    bench.record(time_chained(mstep1k, x1k, n=5),
                 "modern_fft_step_1024_b2_ms", "modern_fft_1024_frames_per_sec",
                 2.0, cost=roofline.compiled_cost(
                     train_step, params1k, opt1k, x1k, spec1k.scales,
                     lr=0.2, domain="fft"),
                 analytic_bytes=roofline.fft_step_bytes(2, 3, 10, 1024, 1024,
                                                        pairs=3))

    # --- window 8 ---
    headline_window("w8", 54.4e-5)

    # =================== full tier (BASELINE.md one-off rows) ============
    if not args.quick:
        from spectralae.train.streaming import fft_stream_sweep, coord_stream

        # ---- per-frame all-pairs stream sweep, 3-pair net @256²
        # (K=8 frames, 100 iters per pair-burst; every pair trained on
        # every frame inside one scan — CLI `--train-pair all
        # --pair-sweep frame`) ----
        xs8 = jax.device_put(
            rng.normal(size=(8, 3, 256, 256)).astype(np.float32) * 50)

        def sweep_step(xs):
            r = fft_stream_sweep(xs, params3, spec3.scales, iters=100)
            return r, xs + r.mses[-1, -1, -1] * 0.0 + 1e-6
        bench.record(time_chained(sweep_step, xs8, n=3, trials=5),
                     "fft_sweep_8x3x100_ms",
                     "fft_sweep_iters_per_sec_sustained", 8 * 3 * 100,
                     cost=scaled(roofline.compiled_cost(
                         fft_stream_sweep, xs8, params3, spec3.scales,
                         iters=100), 8))

        # ---- coord-domain streaming: 32 frames × [full 256² forward +
        # coord step], q=2, pair 0, one scan ----
        def coord_stream_step(xs):
            r = coord_stream(xs, params1, spec.scales, 0, q=2)
            return r, xs + r.mses[-1] * 0.0 + 1e-6
        bench.record(time_chained(coord_stream_step, xs32, n=3, trials=5),
                     "coord_stream_32_ms", "coord_stream_steps_per_sec",
                     32.0, cost=scaled(roofline.compiled_cost(
                         coord_stream, xs32, params1, spec.scales, 0, q=2),
                         32))

        # ---- data-parallel burst at streaming scale: B=32 @256² and
        # B=8 @512² (the batch only enters the correlation precompute) ----
        out32 = fwd1(params1, xs32)

        def dp32_step(x):
            r = fft_burst_dp(x, None, out32, enc.c, dec.c, enc.b, dec.b,
                             lr=0.2, iters=100)
            return r, x + r.mses[-1] * 0.0 + 1e-6
        bench.record(time_chained(dp32_step, xs32, n=4, trials=5),
                     "fft_burst_dp_b32_100_ms",
                     "fft_burst_dp_b32_frame_iters_per_sec", 32 * 100,
                     cost=roofline.compiled_cost(
                         fft_burst_dp, xs32, None, out32, enc.c, dec.c,
                         enc.b, dec.b, lr=0.2, iters=100))

        cfg5 = Config(nx=512, ny=512, d=3,
                      layer=LayerParams(depth=10, lk=1, ll=1, scale=2,
                                        rmax=3.0))
        spec5 = initial_spec(cfg5)
        params5 = init_params(jax.random.key(0), spec5, 1.0)
        enc5, dec5 = params5.pair(0)
        x8_512 = jax.device_put(
            rng.normal(size=(8, 3, 512, 512)).astype(np.float32) * 50)
        fwd5 = jax.jit(lambda p, x: model.forward_fft(p, x, spec5.scales))
        out8_512 = fwd5(params5, x8_512)

        def dp512_step(x):
            r = fft_burst_dp(x, None, out8_512, enc5.c, dec5.c, enc5.b,
                             dec5.b, lr=0.2, iters=100)
            return r, x + r.mses[-1] * 0.0 + 1e-6
        bench.record(time_chained(dp512_step, x8_512, n=3, trials=5),
                     "fft_burst_dp_512_b8_100_ms",
                     "fft_burst_dp_512_b8_frame_iters_per_sec", 8 * 100,
                     cost=roofline.compiled_cost(
                         fft_burst_dp, x8_512, None, out8_512, enc5.c,
                         dec5.c, enc5.b, dec5.b, lr=0.2, iters=100))

        # --- window 9 ---
        headline_window("w9", 62.2e-5)

        # ---- M=50 (the reference source's default depth) @256² ----
        cfg50 = Config(nx=256, ny=256, d=3,
                       layer=LayerParams(depth=50, lk=1, ll=1, scale=2,
                                         rmax=3.0))
        spec50 = initial_spec(cfg50)
        params50 = init_params(jax.random.key(0), spec50, 1.0)
        enc50, dec50 = params50.pair(0)
        fwd50 = jax.jit(lambda p, x: model.forward_fft(p, x, spec50.scales))
        out50 = fwd50(params50, x0[None])[0]

        def burst50(x):
            r = fft_burst_corr(x, None, out50, enc50.c, dec50.c, enc50.b,
                               dec50.b, lr=0.2, iters=burst_iters)
            return r, x + r.mses[-1] * 0.0 + 1e-6
        bench.record(time_chained(burst50, x0, n=10),
                     "fft_burst_100_ms_m50",
                     "fft_backprop_iters_per_sec_256_m50", burst_iters,
                     cost=burst_cost(x0, out50, enc50, dec50, burst_iters))

        # ---- 13×13-kernel burst @256² (large-kernel coverage: the corr
        # burst's lag tensors grow as (4h+1)²; the ω-space Pallas path's
        # cost is kernel-size independent — this row feeds the auto_burst
        # crossover, netlib.cpp:325 tap parameterization) ----
        cfg13 = Config(nx=256, ny=256, d=3,
                       layer=LayerParams(depth=10, lk=5, ll=5, scale=2,
                                         rmax=3.0))
        spec13 = initial_spec(cfg13)
        params13 = init_params(jax.random.key(0), spec13, 1.0)
        enc13, dec13 = params13.pair(0)
        fwd13 = jax.jit(lambda p, x: model.forward_fft(p, x, spec13.scales))
        out13 = fwd13(params13, x0[None])[0]

        def burst13_corr(x):
            r = fft_burst_corr(x, None, out13, enc13.c, dec13.c, enc13.b,
                               dec13.b, lr=0.2, iters=burst_iters)
            return r, x + r.mses[-1] * 0.0 + 1e-6

        def burst13_pallas(x):
            r = fft_burst_pallas_fused(x, x, out13, enc13.c, dec13.c,
                                       enc13.b, dec13.b, lr=0.2,
                                       iters=burst_iters)
            return r, x + r.mses[-1] * 0.0 + 1e-6
        bench.record(time_chained(burst13_corr, x0, n=8),
                     "fft_burst_100_ms_13x13[corr]",
                     "fft_backprop_iters_per_sec_256_13x13[corr]",
                     burst_iters,
                     cost=burst_cost(x0, out13, enc13, dec13, burst_iters))
        try:
            bench.record(
                time_chained(burst13_pallas, x0, n=5, trials=3),
                "fft_burst_100_ms_13x13[pallas-fused]",
                "fft_backprop_iters_per_sec_256_13x13[pallas-fused]",
                burst_iters)
        except Exception as e:      # noqa: BLE001 — Mosaic VMEM limits
            bench.fail("fft_burst_100_ms_13x13[pallas-fused]", e)

    # --- window 5: end of run ---
    headline_window("w5", 31.1e-5)

    # headline = MEDIAN of the (up to 9) time-separated window FLOORS:
    # the floor of one window estimates device time under additive tunnel
    # noise; the median across windows is reproducible by construction
    # (no single tunnel period, good or bad, decides the value).  The
    # quotable number is the median, so its band is the INTERQUARTILE
    # spread of the window floors (the band a re-run's median lands in —
    # round-4 evidence: two full runs' medians agreed to 10 % while the
    # full window range was ~2×); the full range ships as range_pct.
    # cross-window physicality guard: the per-row >peak-FLOP/s rebase
    # cannot bite at 256² (the dispatch-bound burst is far from compute
    # peak), but relay-dedup artifacts still occasionally slip past the
    # tunnel floor INSIDE one window (observed: a 715k it/s window floor
    # in a run whose eight other windows sat at 35-76k — 0.14 ms for a
    # burst whose iterations alone cost ~0.5 ms).  Tunnel noise is
    # strictly additive, so a window floor far ABOVE its peers is an
    # artifact of that window, never weather: drop floors >3× the median
    # of the windows and ship them under headline_windows_discarded.
    if windows_floor:
        med0 = float(np.median(windows_floor))
        bogus = [w for w in windows_floor if w > 3.0 * med0]
        if bogus:
            results["headline_windows_discarded"] = bogus
            keep_w = [i for i, w in enumerate(windows_floor)
                      if w <= 3.0 * med0]
            windows_floor = [windows_floor[i] for i in keep_w]
            windows_median = [windows_median[i] for i in keep_w]
    fft_steps_per_sec = (float(np.median(windows_floor))
                         if windows_floor else None)
    fft_steps_per_sec_median = (float(np.median(windows_median))
                                if windows_median else None)
    spread_pct = range_pct = None
    if fft_steps_per_sec:
        q25, q75 = np.percentile(windows_floor, [25, 75])
        spread_pct = 100.0 * (q75 - q25) / fft_steps_per_sec
        range_pct = (100.0 * (max(windows_floor) - min(windows_floor))
                     / fft_steps_per_sec)
    results["headline_windows_floor"] = windows_floor
    results["headline_windows_median"] = windows_median
    results["headline_range_pct"] = range_pct
    results["headline_basis"] = (
        "median of the window floors from up to nine time-separated "
        "windows spread across the run, fastest impl; each window floor "
        "= best of 5 chained trials (device-time estimate; tunnel noise "
        "is additive).  spread_pct = IQR/median of the window floors — "
        "the reproducibility band of the quoted MEDIAN (what a re-run "
        "lands in); range_pct = (max-min)/median, the band of a single "
        "window under tunnel weather.  Per-impl floors in *_ms keys, "
        "medians in *_ms:median and *_median keys; per-row roofline in "
        "util[...] keys")
    bench.flush()

    rnd = lambda v, n: round(v, n) if v is not None else None
    print(json.dumps({
        "metric": "fft_backprop_iters_per_sec_256",
        "value": rnd(fft_steps_per_sec, 1),
        "unit": "iters/s",
        "vs_baseline": rnd(
            fft_steps_per_sec / REFERENCE_FFT_ITERS_PER_SEC_ESTIMATE
            if fft_steps_per_sec is not None else None, 2),
        "median": rnd(fft_steps_per_sec_median, 1),
        "spread_pct": rnd(spread_pct, 1),
        "stream_sustained": (
            round(results["fft_stream_iters_per_sec_sustained"], 1)
            if results.get("fft_stream_iters_per_sec_sustained") else None),
    }))


if __name__ == "__main__":
    main()
