// Executed-reference parity shim for the reference's CUDA translation
// units, compiled for CPU through tests/refstub/ (serial kernel-launch
// emulation + naive-DFT cuFFT).  Extends the round-3 harness from
// netlib.cpp to the reference's actual GPU training paths:
//
//   Conv_gpu         backproplib.cu:114-182      (coord forward, C2)
//   backprop_gpu     backproplib.cu:291-418      (coord train step, C3/C4)
//   backprop_gpu_cc  backproplib.cu:521-644      (symmetric variant, C6)
//   autoenc_fft      fft_backproplib.cu:1331-1376 (momentum-space forward, F16)
//   backprop_fft     fft_backproplib.cu:1381-1511 (100-iter burst, F17)
//
// The reference sources are compiled from /root/reference/source via a
// mechanical <<<>>>-launch rewrite into the gitignored .ref_build/ (see
// tests/reference_build.py) — nothing is copied into the repository; this
// file is original marshalling glue only.

#include <vector>

#include <cuda_runtime.h>
#include <cufft.h>

#include "backproplib.h"      // resolved from /root/reference/source via -I
#include "fft_backproplib.h"  // (only autoenc_fft/backprop_fft decls used)

// the dead shared-memory kernel conv_k1 (fft_backproplib.cu:191-229)
// declares `extern __shared__` arrays; with __shared__ compiled away they
// become references to these globals (never executed — no launch site)
cufftComplex in_s[1];
cufftComplex c_s[1];

// non-header reference functions linked from the transformed unit
// (signatures match fft_backproplib.cu:869, 1018, 1117)
void kfft(std::vector<std::vector<std::vector<std::vector<float> > > >& c,
          std::vector<float>& b, cufftComplex* cfreq_d, cufftReal* b_d);
void store_cfreq(cufftComplex* cfreq_d, std::vector<float>& c_freq, int dM,
                 int dD, int Nx, int Nyr);

namespace {

using V1 = std::vector<float>;
using V2 = std::vector<V1>;
using V3 = std::vector<V2>;
using V4 = std::vector<V3>;

V3 to3(const float* p, int d0, int d1, int d2) {
  V3 v(d0, V2(d1, V1(d2)));
  for (int a = 0; a < d0; ++a)
    for (int b = 0; b < d1; ++b)
      for (int c = 0; c < d2; ++c) v[a][b][c] = *p++;
  return v;
}

void from3(const V3& v, float* p) {
  for (const auto& a : v)
    for (const auto& b : a)
      for (float c : b) *p++ = c;
}

V4 to4(const float* p, int d0, int d1, int d2, int d3) {
  V4 v(d0, V3(d1, V2(d2, V1(d3))));
  for (int a = 0; a < d0; ++a)
    for (int b = 0; b < d1; ++b)
      for (int c = 0; c < d2; ++c)
        for (int e = 0; e < d3; ++e) v[a][b][c][e] = *p++;
  return v;
}

void from4(const V4& v, float* p) {
  for (const auto& a : v)
    for (const auto& b : a)
      for (const auto& c : b)
        for (float e : c) *p++ = e;
}

// the reference's freq-kernel cache fill (StoreLoad_cfreq's first-call
// branch, fft_backproplib.cu:1148-1157): circular pad to Nx×Ny, batched
// R2C, marshal to the interleaved host layout backprop_fft consumes
V1 make_cfreq(const V4& c, V1& b, int Nx, int Ny) {
  int dM = (int)c.size(), dD = (int)c[0].size();
  V4 c_pad;
  kernel_pad(const_cast<V4&>(c), c_pad, Nx, Ny);
  cufftComplex* cfreq_d;
  cufftReal* b_d;
  cudaMalloc(&cfreq_d, (size_t)dM * dD * Nx * (Ny / 2 + 1) *
                           sizeof(cufftComplex));
  cudaMalloc(&b_d, dM * sizeof(cufftReal));
  kfft(c_pad, b, cfreq_d, b_d);
  V1 cfreq((size_t)dM * dD * Nx * (Ny / 2 + 1) * 2);
  store_cfreq(cfreq_d, cfreq, dM, dD, Nx, Ny / 2 + 1);
  cudaFree(cfreq_d);
  cudaFree(b_d);
  return cfreq;
}

}  // namespace

extern "C" {

// in [D,Nx,Ny], c [M,D,Nk,Nl], b [M] -> out [M,Nx,Ny]
// (the GPU forward: /dM pre-scale + the ref_gpu tap anchor)
void ref_conv_gpu(const float* in, int D, int Nx, int Ny, const float* c,
                  int M, int Nk, int Nl, const float* b, float* out) {
  V3 vin = to3(in, D, Nx, Ny);
  V3 vout(M, V2(Nx, V1(Ny, 0.f)));
  V4 vc = to4(c, M, D, Nk, Nl);
  V1 vb(b, b + M);
  Conv_gpu(vin, vout, vc, vb);
  from3(vout, out);
}

// One coordinate-space GPU train step (sym=0: backprop_gpu, sym=1:
// backprop_gpu_cc).  c [M,D,Nk,Nl], f [D,M,Nk,Nl], b [M], p [D] and the
// momentum buffers dc/df/db/dp (same shapes) are updated in place.  The
// adapt-rate shadow state (ddc/ddf/ddb/ddp) is internal zeros: adapt_rate
// overwrites del with delmax unconditionally (backproplib.cu:34), so the
// shadow never influences the update.
void ref_backprop_gpu(const float* in, const float* out, const float* hin,
                      int D, int M, int Nx, int Ny, int Nk, int Nl,
                      float* c, float* b, float* f, float* p, float* dc,
                      float* db, float* df, float* dp, float delmax,
                      float alpha, int active, int sym) {
  V3 vin = to3(in, D, Nx, Ny);
  V3 vout = to3(out, D, Nx, Ny);
  V3 vhin = to3(hin, M, Nx, Ny);
  V4 vc = to4(c, M, D, Nk, Nl), vf = to4(f, D, M, Nk, Nl);
  V4 vdc = to4(dc, M, D, Nk, Nl), vdf = to4(df, D, M, Nk, Nl);
  V1 vb(b, b + M), vp(p, p + D), vdb(db, db + M), vdp(dp, dp + D);
  V4 ddc(M, V3(D, V2(Nk, V1(Nl, 0.f))));
  V4 ddf(D, V3(M, V2(Nk, V1(Nl, 0.f))));
  V1 ddb(M, 0.f), ddp(D, 0.f);
  if (sym)
    backprop_gpu_cc(vin, vout, vhin, vc, vb, vf, vp, vdc, vdb, vdf, vdp,
                    ddc, ddb, ddf, ddp, delmax, alpha, active);
  else
    backprop_gpu(vin, vout, vhin, vc, vb, vf, vp, vdc, vdb, vdf, vdp, ddc,
                 ddb, ddf, ddp, delmax, alpha, active);
  from4(vc, c);
  from4(vf, f);
  from4(vdc, dc);
  from4(vdf, df);
  std::copy(vb.begin(), vb.end(), b);
  std::copy(vp.begin(), vp.end(), p);
  std::copy(vdb.begin(), vdb.end(), db);
  std::copy(vdp.begin(), vdp.end(), dp);
}

// Whole-network momentum-space forward (fft_l=0: input spectrum → per
// stage spectral pool + pointwise conv → one inverse FFT).  Note: the
// reference reads ``net_c[n+1].size()`` past the end of the stage vector
// on its last loop iteration (fft_backproplib.cu:1369) — ASan confirms
// an 8-byte out-of-bounds READ; the value is never used after the loop,
// so execution is unaffected (reference UB, documented not fixed).
// n_stage
// kernels are concatenated in cs (stage n: [M_n, D_n, Nk, Nl] with
// D_0 = D, D_n = M_{n-1}) and bs; scales[n] matches the reference's
// signed convention.  The freq-kernel cache starts empty and is filled
// by the call (exercising kernel_pad + kfft + store_cfreq).
// out receives layers.back() = [M_last, Nx, Ny].
void ref_autoenc_fft(const float* in, int D, int Nx, int Ny, int n_stage,
                     const int* ms, const int* scales, int Nk, int Nl,
                     const float* cs, const float* bs, float* out) {
  std::vector<V3> layers;
  layers.push_back(to3(in, D, Nx, Ny));
  std::vector<V4> net_c;
  std::vector<V1> net_b;
  std::vector<int> scale(scales, scales + n_stage);
  int dprev = D;
  for (int n = 0; n < n_stage; ++n) {
    net_c.push_back(to4(cs, ms[n], dprev, Nk, Nl));
    cs += (size_t)ms[n] * dprev * Nk * Nl;
    net_b.push_back(V1(bs, bs + ms[n]));
    bs += ms[n];
    dprev = ms[n];
  }
  layers.push_back(V3(dprev, V2(Nx, V1(Ny, 0.f))));
  std::vector<V1> net_cfreq;
  autoenc_fft(layers, net_c, net_cfreq, net_b, scale, /*fft_l=*/0);
  from3(layers.back(), out);
}

// The reference's 100-iteration frozen-spectrum burst.  c [M,D,Nk,Nl],
// f [D,M,Nk,Nl], b [M], p [D] are updated in place; the freq-kernel
// caches are built internally exactly as the app does before the first
// burst (StoreLoad_cfreq fill path).  MSE telemetry goes to stdout
// ("mse fft: …" then 100 "n: i mse: …" lines), as in the reference.
void ref_backprop_fft(const float* in, const float* expout,
                      const float* out, int D, int M, int Nx, int Ny,
                      int Nk, int Nl, float del0, int maxdiff, float* c,
                      float* b, float* f, float* p) {
  V3 vin = to3(in, D, Nx, Ny);
  V3 vexpout = to3(expout, D, Nx, Ny);
  V3 vout = to3(out, D, Nx, Ny);
  V4 vc = to4(c, M, D, Nk, Nl), vf = to4(f, D, M, Nk, Nl);
  V1 vb(b, b + M), vp(p, p + D);
  V1 cfreq = make_cfreq(vc, vb, Nx, Ny);
  V1 ffreq = make_cfreq(vf, vp, Nx, Ny);
  backprop_fft(vin, vexpout, vout, cfreq, vc, ffreq, vf, vb, vp, M, del0,
               maxdiff);
  from4(vc, c);
  from4(vf, f);
  std::copy(vb.begin(), vb.end(), b);
  std::copy(vp.begin(), vp.end(), p);
}

}  // extern "C"
