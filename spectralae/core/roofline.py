"""Roofline accounting: FLOPs / HBM bytes per compiled program vs chip peaks.

The reference ships no utilization numbers at all (SURVEY.md §6 — its only
perf claim is the qualitative "much faster", /root/reference/README.md:5-6).
This module fills the empty "util" cell: every bench row reports its work
and traffic next to its time, so "bandwidth-bound" is a checked claim
(flops/s and bytes/s vs the chip's peaks), not an assertion from timings.

Two sources, combined per row:

1. **XLA's own cost model** (:func:`compiled_cost`): ``flops`` and
   ``bytes accessed`` from ``Compiled.cost_analysis()`` on the optimized
   (post-fusion) HLO.  This is the compiler's estimate of arithmetic and
   memory traffic for everything XLA generates — FFTs, matmuls, elementwise
   fusions.  It counts each fused computation's operand/result bytes, i.e.
   approximately HBM traffic (VMEM-resident reuse inside a fusion is not
   double-counted).

2. **Analytic supplements for Pallas kernels** (:func:`anchor_windows_cost`):
   XLA sees a Mosaic kernel as an opaque custom call (0 flops), so rows that
   route through ``ops/pallas_windows.anchor_windows`` add the kernel's
   arithmetic from its shape algebra.  The kernel's HBM traffic is its
   operand reads + output writes (the design invariant: anchor spectra and
   EG planes never leave VMEM — ops/pallas_windows.py docstring), which the
   custom-call boundary already accounts bytes for.

Peaks are the public per-chip numbers (cloud.google.com/tpu/docs/vXX):
dense peak matmul throughput at bf16 and HBM bandwidth.  f32 work on the
MXU runs below the bf16 peak (pass emulation), so ``pct_peak_flops`` is a
*lower bound* on how busy the MXU actually is; ``pct_peak_bw`` is the
meaningful ceiling for this workload (the large-N burst is HBM-bound).

Caveats on ``pct_peak_bw``: XLA's "bytes accessed" counts every fusion's
operand+result bytes, which OVERCOUNTS true HBM traffic when consecutive
fusions hand buffers over without round-tripping (and the floor time is
itself an estimate under tunnel noise) — so rows can legitimately report
>100 %.  Read pct_peak_bw ≳ 100 as "this program moves roughly its
cost-model bytes at full bandwidth" — i.e. bandwidth-saturated — not as a
violation of physics.  The Pallas-kernel rows use the analytic byte count
(exact by construction), so their percentages are true utilization.
"""

from __future__ import annotations

from typing import NamedTuple

# (marketing name, dense bf16 peak FLOP/s, HBM bytes/s) — public specs
_PEAKS = (
    ("v6 lite", "TPU v6e (Trillium)", 918e12, 1640e9),
    ("v6e", "TPU v6e (Trillium)", 918e12, 1640e9),
    ("v5 lite", "TPU v5e", 197e12, 819e9),
    ("v5e", "TPU v5e", 197e12, 819e9),
    ("v5p", "TPU v5p", 459e12, 2765e9),
    ("v5", "TPU v5e", 197e12, 819e9),
    ("v4", "TPU v4", 275e12, 1228e9),
)


class Peaks(NamedTuple):
    name: str
    flops: float    # dense bf16 peak, FLOP/s
    hbm: float      # HBM bandwidth, bytes/s


def device_peaks(device=None) -> Peaks | None:
    """Chip peaks for ``device`` (default: jax.devices()[0]), or None when
    the platform has no table entry (CPU test runs)."""
    import jax
    if device is None:
        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = getattr(device, "device_kind", "") or str(device)
    kind_l = kind.lower()
    for key, name, fl, bw in _PEAKS:
        if key in kind_l:
            return Peaks(name=name, flops=fl, hbm=bw)
    return None


def compiled_cost(jfn, *args, **kwargs) -> tuple[float | None, float | None]:
    """(flops, bytes_accessed) of ``jfn(*args, **kwargs)`` from XLA's cost
    analysis of the compiled program.

    ``jfn`` must be a ``jax.jit`` wrapper; lowering re-traces but the
    backend compile is a persistent-cache hit when the same program already
    ran (bench.py always times first, then costs).  Returns (None, None)
    on any failure — a missing cost must never kill a bench run.

    Known limitation: XLA costs a ``while``/``scan`` body ONCE, not ×trip
    count.  Callers scale scan-over-frames rows by the trip count
    (slight overcount of loop-invariant traffic — conservative for
    pct_peak) and add :func:`corr_iter_flops` for the burst's inner
    ``fori_loop`` (whose arithmetic XLA never sees multiplied).
    """
    try:
        ca = jfn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def anchor_windows_cost(B: int, D: int, nx: int, ny: int,
                        hx2: int, hy2: int,
                        signal_bytes: int = 4) -> tuple[float, float]:
    """Analytic (flops, hbm_bytes) of one ``anchor_windows`` kernel call.

    Per (batch, ω-bin) the kernel does (ops/pallas_windows._make_anchor_kernel;
    nk2 = 2hx2+1 composed-tap rows, vy2 = 2hy2+1 / vy4 = 4hy2+1 window cols):

    - anchor spectra x-stage: 4 dots of K=nk2 per (e,d) → 8·nk2·D²
    - EG accumulate (complex multiply-add): 8·D²
    - EG window products + y-stage dots: (6 + 8·vy2)·D²
    - XX products + y-stage dots on the d≤e pairs: (6 + 8·vy4)·D(D+1)/2
    - |EG|² + DC scalars: 4·D

    The x-stage window contractions cost 4·(vx·vy)·pairs per *row* —
    ~vy/nyr of the y-stage — and are dropped.  HBM traffic is one read of
    the split re/im signal spectra (``2·B·D·nx·nyr·signal_bytes``; pass
    ``signal_bytes=2`` for the bf16 streaming path) plus the tiny
    constant operands/outputs, dropped likewise.
    """
    nyr = ny // 2 + 1
    nk2 = 2 * hx2 + 1
    vy2 = 2 * hy2 + 1
    vy4 = 4 * hy2 + 1
    per_bin = (D * D * (8 * nk2 + 8 + 6 + 8 * vy2)
               + (D * (D + 1) // 2) * (6 + 8 * vy4)
               + 4 * D)
    flops = float(B * nx * nyr * per_bin)
    hbm = float(2 * B * D * nx * nyr * signal_bytes)
    return flops, hbm


def corr_iter_flops(D: int, M: int, nk: int, nl: int, iters: int) -> float:
    """Arithmetic of the correlation burst's inner ``fori_loop`` body ×
    iterations (train/fft_corr.corr_iterate) — invisible to XLA's cost
    model (while bodies are costed once).

    Per iteration, on the bias-extended tape (dDe=D+1, dMe=M+1, P=nk·nl,
    n2=(4⌊nk/2⌋+1)(4⌊nl/2⌋+1) composed-support lags):

    - composed kernel: einsum [dD,dMe,P]×[dMe,dDe,P] + scatter
      [dde,P²]@[P²,n2]
    - R(ΔK): einsum over (e,c,u,d,L) → 2·dD·dDe²·n2²
    - Tg gather: [dde,n2]@[n2,P²]
    - gc/gf einsums: ≈ 2 × the composed-kernel einsum
    """
    dDe, dMe = D + 1, M + 1
    dde = D * dDe
    P = nk * nl
    n2 = (4 * (nk // 2) + 1) * (4 * (nl // 2) + 1)
    k2 = 2 * D * dMe * dDe * P * P
    per_iter = (k2                      # composed kernel einsum
                + 2 * dde * P * P * n2  # (q,r)→u scatter matmul
                + 2 * D * dDe * dDe * n2 * n2   # R(ΔK)
                + 2 * dde * n2 * P * P  # Tg gather matmul
                + 2 * k2)               # gc + gf
    return float(per_iter * iters)


def pallas_rfft2_cost(B: int, D: int, nx: int, ny: int,
                      out_bytes: int = 4,
                      max_m1: int | None = None) -> tuple[float, float]:
    """Analytic (flops, hbm_bytes) of one mixed-order Pallas rfft2
    (ops/pallas_fft.rfft2_mixed) over ``[B, D, nx, ny]`` real input —
    invisible to XLA's cost model (custom calls are not costed).

    Matmul flops from the kernel shapes (2 flops per MAC; m1 = n/4,
    k1p = _k1p(n)):

    - real y-leaf: 12 dots [nx, m1]×[m1, k1p] per plane
    - complex y-leaf (wrapper recursion streams): 16 dots
    - x-leaf: 16 dots [m1, m1]×[m1, L] per plane-group
    - wrapper butterfly rounds: ~12 VPU flops/element, one extra HBM
      read+write of the split planes each

    HBM: one read of x, the inter-stage split-plane write+read, the
    mixed-order write (×``out_bytes``), and the final y-group
    lane-transpose pass (XLA; same dtype as the output).
    """
    from ..ops.pallas_fft import _k1p, _MAX_M1
    if max_m1 is None:
        max_m1 = _MAX_M1
    BD = B * D
    plane = nx * (ny // 2 + 1)              # ~split-plane elements

    # ---- y-stage (transform length ny over nx rows per plane) ----
    flops, hbm = 0.0, float(BD * nx * ny * 4)          # read x (f32)
    n, rounds = ny, 0
    while n // 4 > max_m1:
        flops += 12.0 * BD * nx * n                    # butterfly VPU
        hbm += 2 * 2 * BD * nx * n * 4                 # write+read ×2 planes
        n //= 4
        rounds += 1
    g = 4 ** rounds
    dots = 12 if rounds == 0 else 16                   # real vs complex leaf
    flops += dots * 2.0 * BD * g * nx * (n // 4) * _k1p(n)
    k1p_leaf = _k1p(n)
    L = 4 * g * k1p_leaf                               # total mixed lanes
    hbm += 2 * BD * nx * L * 4.0                       # y-stage write

    # ---- x-stage (transform length nx, lanes L per plane) ----
    hbm += 2 * BD * nx * L * 4.0                       # x-stage read
    n = nx
    while n // 4 > max_m1:
        flops += 12.0 * BD * L * n
        hbm += 2 * 2 * BD * n * L * 4
        n //= 4
    m1 = n // 4
    flops += 16 * 2.0 * BD * (nx // n) * m1 * m1 * L
    hbm += 2 * BD * nx * L * float(out_bytes)          # mixed write
    # final lane transpose (XLA moveaxis): read + write
    hbm += 2 * 2 * BD * nx * L * float(out_bytes)
    del plane
    return flops, hbm


def spectral_conv_bytes(B: int, D: int, M: int, nx: int, ny: int) -> float:
    """Analytic HBM byte *bound* for one rfft2 → pointwise conv → irfft2
    round trip (the ``conv_spectral_*`` bench rows): every resolution-
    sized array counted once written + once read where it crosses a
    fusion boundary (input read, X/kernel/Y spectra w+r as split-complex
    f32, output write).  True traffic can only be LOWER (XLA may fuse
    some handovers), so pct_peak_bw against this bound is an upper
    bound on utilization — unlike XLA's bytes-accessed, it can never
    exceed physics."""
    nyr = ny // 2 + 1
    cplx = 8.0
    return float(B * D * nx * ny * 4            # x read
                 + 2 * B * D * nx * nyr * cplx  # X write+read
                 + 2 * M * D * nx * nyr * cplx  # kernel spectra w+r
                 + 2 * B * M * nx * nyr * cplx  # Y write+read
                 + B * M * nx * ny * 4)         # out write


def fft_step_bytes(B: int, D: int, M: int, nx: int, ny: int,
                   pairs: int) -> float:
    """Analytic HBM byte bound for one fused fwd+bwd ``train_step``
    (``modern_fft_step_*`` rows): forward traffic = the input/output
    planes plus each stage's activation spectra (write+read, split-
    complex) down the pooled pyramid and back up; backward ≈ 2× forward
    (re-read activations + write cotangents).  A bound, not an exact
    count — XLA's fusions can only move less."""
    nyr_of = lambda r: r // 2 + 1
    fwd = B * D * nx * ny * 4.0 + B * D * nx * ny * 4.0   # x read, recon w
    for s in range(pairs):
        r = nx >> (s + 1)                # resolution after encoder pool s
        din = D if s == 0 else M
        # encoder stage s: read in-spectra, write out-spectra (and the
        # mirrored decoder stage moves the same planes back up)
        stage = (B * din * r * nyr_of(r) * 8.0
                 + B * M * r * nyr_of(r) * 8.0)
        fwd += 2 * stage
    return float(3.0 * fwd)


def corr_burst_bytes(B: int, D: int, nx: int, ny: int, *,
                     fused: bool, signal_bytes: int = 4) -> float:
    """Analytic HBM byte bound for the correlation burst's precompute
    (``fft_burst_100_ms_*`` rows; the 100 iterations move only
    window-sized tensors).  XLA path (``fused=False``): signal spectra
    write+read plus the [D², nx, nyr] XX and EG product planes
    (write + one read by the lag-window transforms).  Fused Pallas path:
    the kernel reads the split spectra once and products never touch
    HBM (ops/pallas_windows.py design invariant)."""
    nyr = ny // 2 + 1
    x_read = B * D * nx * ny * 4.0
    spectra = 2 * B * D * nx * nyr * 2 * float(signal_bytes)  # w+r, re+im
    if fused:
        return float(x_read + spectra)
    planes = 2 * (D * D) * nx * nyr * 8.0 * 2     # XX + EG, w+r each
    return float(x_read + spectra + B * planes)


def utilization(flops: float | None, bytes_: float | None,
                seconds: float, peaks: Peaks | None) -> dict:
    """Per-row utilization dict for bench_details.json."""
    out = {}
    if flops is not None:
        out["gflop"] = round(flops / 1e9, 3)
        out["gflops_per_s"] = round(flops / seconds / 1e9, 1)
        if peaks:
            out["pct_peak_flops"] = round(
                100.0 * flops / seconds / peaks.flops, 2)
    if bytes_ is not None:
        out["gb"] = round(bytes_ / 1e9, 3)
        out["gb_per_s"] = round(bytes_ / seconds / 1e9, 1)
        if peaks:
            out["pct_peak_bw"] = round(
                100.0 * bytes_ / seconds / peaks.hbm, 2)
    if peaks:
        out["peaks"] = f"{peaks.name}: {peaks.flops/1e12:.0f} TFLOP/s bf16, " \
                       f"{peaks.hbm/1e9:.0f} GB/s HBM"
    return out
