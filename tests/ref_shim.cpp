// Executed-reference parity shim (VERDICT r2 item 1).
//
// Flat-array extern "C" entry points over the reference's CPU translation
// unit.  The reference sources are compiled *in place* from
// /root/reference/source/netlib.cpp by tests/reference_build.py — nothing
// is copied into this repository; this file is original glue only
// (pack/unpack between flat buffers and the reference's nested vectors).
//
// Covered reference functions (all of netlib.cpp's compute surface):
//   Conv           netlib.cpp:318-358   (CPU reference convolution, N8)
//   backprop       netlib.cpp:361-451   (CPU reference train step, N9)
//   Pool           netlib.cpp:114-164   (max-pool / NN upsample, N4)
//   Portion        netlib.cpp:292-315   (center training crop, N7)
//   SaveLoad_conv  netlib.cpp:220-272   (.conv checkpoint format, N6)

#include <opencv2/opencv.hpp>

#include <string>
#include <vector>

#include "netlib.h"  // resolved from /root/reference/source via -I

// act/act1 (declared through backproplib.h) are now linked from the
// reference's own backproplib.cu, compiled for CPU via tests/refstub/ —
// see tests/reference_build.py and tests/ref_cuda_shim.cpp.

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

}  // namespace

extern "C" {

// in [D,Nx,Ny], c [M,D,Nk,Nl], b [M] -> out [M,Nx,Ny]
void ref_conv(const float* in, int D, int Nx, int Ny, const float* c, int M,
              int Nk, int Nl, const float* b, float* out) {
  V3 vin = to3(in, D, Nx, Ny);
  V3 vout(M, V2(Nx, V1(Ny, 0.f)));
  V4 vc = to4(c, M, D, Nk, Nl);
  V1 vb(b, b + M);
  Conv(vin, vout, vc, vb);
  from3(vout, out);
}

// One CPU reference train step; c [M,D,Nk,Nl], f [D,M,Nk,Nl], b [M], p [D]
// are updated in place.
void ref_backprop(const float* in, const float* out, const float* hin, int D,
                  int M, int Nx, int Ny, int Nk, int Nl, float* c, float* b,
                  float* f, float* p, float del) {
  V3 vin = to3(in, D, Nx, Ny);
  V3 vout = to3(out, D, Nx, Ny);
  V3 vhin = to3(hin, M, Nx, Ny);
  V4 vc = to4(c, M, D, Nk, Nl);
  V4 vf = to4(f, D, M, Nk, Nl);
  V1 vb(b, b + M);
  V1 vp(p, p + D);
  backprop(vin, vout, vhin, vc, vb, vf, vp, del);
  from4(vc, c);
  from4(vf, f);
  std::copy(vb.begin(), vb.end(), b);
  std::copy(vp.begin(), vp.end(), p);
}

// in [D,Nx,Ny] -> out [D,Ox,Oy]; caller supplies the output dims
// (Nx/scale downsample for scale>0, Nx*|scale| upsample for scale<0).
void ref_pool(const float* in, int D, int Nx, int Ny, int scale, float* out,
              int Ox, int Oy) {
  V3 vin = to3(in, D, Nx, Ny);
  V3 vout(D, V2(Ox, V1(Oy, 0.f)));
  Pool(vin, vout, scale);
  from3(vout, out);
}

// Center crop of the training triple to [*, Nx/q, Ny/q].
void ref_portion(const float* in, const float* hin, const float* out, int D,
                 int M, int Nx, int Ny, int q, float* in_s, float* hin_s,
                 float* out_s) {
  V3 vin = to3(in, D, Nx, Ny);
  V3 vhin = to3(hin, M, Nx, Ny);
  V3 vout = to3(out, D, Nx, Ny);
  V3 vin_s(D, V2(Nx / q, V1(Ny / q, 0.f)));
  V3 vhin_s(M, V2(Nx / q, V1(Ny / q, 0.f)));
  V3 vout_s(D, V2(Nx / q, V1(Ny / q, 0.f)));
  Portion(vin, vhin, vout, vin_s, vhin_s, vout_s, q);
  from3(vin_s, in_s);
  from3(vhin_s, hin_s);
  from3(vout_s, out_s);
}

// write=1 saves c/b to ./weights/C_weights_... (cwd-relative, exactly the
// reference's path scheme); write=0 loads into c/b.
void ref_saveload_conv(float* c, float* b, int M, int D, int Nk, int Nl,
                       int scale, int L, int io, int write) {
  V4 vc = to4(c, M, D, Nk, Nl);
  V1 vb(b, b + M);
  SaveLoad_conv(vc, vb, scale, L, io, write);
  from4(vc, c);
  std::copy(vb.begin(), vb.end(), b);
}

}  // extern "C"
