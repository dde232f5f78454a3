// CPU-emulation stub of cuFFT for the executed-reference parity harness.
//
// Scope: exactly the surface fft_backproplib.cu uses (SURVEY.md §2.4
// F13/F14/F18) — batched 2-D R2C / C2R plans over contiguous row-major
// layouts via cufftPlanMany, executed with cufftExecR2C / cufftExecC2R.
// The transform is a straightforward row-column complex DFT (O(N³) per
// plane) with cuFFT's conventions: forward R2C is unnormalized and emits
// the Ny/2+1 non-negative-frequency columns; inverse C2R is unnormalized
// (callers divide by Nx·Ny themselves, fft_backproplib.cu:831).
// Numerical agreement with a real FFT is ~1e-5 relative at the harness's
// test sizes.  All original code.
#ifndef REFSTUB_CUFFT_H_
#define REFSTUB_CUFFT_H_

#include <cmath>
#include <cstring>
#include <map>
#include <vector>

typedef float cufftReal;
struct cufftComplex {
  float x, y;
};

typedef int cufftResult;
const cufftResult CUFFT_SUCCESS = 0;
enum cufftType { CUFFT_R2C = 0x2a, CUFFT_C2R = 0x2c, CUFFT_C2C = 0x29 };
typedef int cufftHandle;

struct CufftStubPlan {
  int nx, ny, batch;
  cufftType type;
};

inline std::map<cufftHandle, CufftStubPlan>& cufft_stub_plans() {
  static std::map<cufftHandle, CufftStubPlan> plans;
  return plans;
}

// The reference only ever creates contiguous batched 2-D plans (embed ==
// logical dims, stride 1); the embed/stride/dist arguments are accepted
// and ignored beyond that contract.
inline cufftResult cufftPlanMany(cufftHandle* plan, int rank, int* n,
                                 int* /*inembed*/, int /*istride*/,
                                 int /*idist*/, int* /*onembed*/,
                                 int /*ostride*/, int /*odist*/,
                                 cufftType type, int batch) {
  static cufftHandle next = 1;
  if (rank != 2) return 1;
  *plan = next++;
  cufft_stub_plans()[*plan] = CufftStubPlan{n[0], n[1], batch, type};
  return CUFFT_SUCCESS;
}

inline cufftResult cufftDestroy(cufftHandle plan) {
  cufft_stub_plans().erase(plan);
  return CUFFT_SUCCESS;
}

namespace cufft_stub {

// 1-D complex DFT along a strided input axis, contiguous output:
// out[k] = sum_j in[j·stride]·e^{sign·2πi jk/n}
inline void dft1d(const cufftComplex* in, int in_stride, cufftComplex* out,
                  int n, double sign) {
  for (int k = 0; k < n; ++k) {
    double sr = 0.0, si = 0.0;
    for (int j = 0; j < n; ++j) {
      double ang = sign * 2.0 * M_PI * (double)j * (double)k / (double)n;
      double c = std::cos(ang), s = std::sin(ang);
      sr += in[j * in_stride].x * c - in[j * in_stride].y * s;
      si += in[j * in_stride].x * s + in[j * in_stride].y * c;
    }
    out[k].x = (float)sr;
    out[k].y = (float)si;
  }
}

// full 2-D complex DFT of one nx×ny plane, in place
inline void dft2d(std::vector<cufftComplex>& buf, int nx, int ny,
                  double sign) {
  std::vector<cufftComplex> tmp((size_t)(nx > ny ? nx : ny));
  for (int i = 0; i < nx; ++i) {  // rows
    dft1d(&buf[(size_t)i * ny], 1, tmp.data(), ny, sign);
    std::memcpy(&buf[(size_t)i * ny], tmp.data(),
                sizeof(cufftComplex) * ny);
  }
  for (int j = 0; j < ny; ++j) {  // columns
    dft1d(&buf[j], ny, tmp.data(), nx, sign);
    for (int i = 0; i < nx; ++i) buf[(size_t)i * ny + j] = tmp[i];
  }
}

}  // namespace cufft_stub

inline cufftResult cufftExecR2C(cufftHandle plan, cufftReal* in,
                                cufftComplex* out) {
  const CufftStubPlan& p = cufft_stub_plans()[plan];
  int nx = p.nx, ny = p.ny, nyr = ny / 2 + 1;
  std::vector<cufftComplex> buf((size_t)nx * ny);
  for (int b = 0; b < p.batch; ++b) {
    const cufftReal* src = in + (size_t)b * nx * ny;
    for (size_t i = 0; i < (size_t)nx * ny; ++i) {
      buf[i].x = src[i];
      buf[i].y = 0.0f;
    }
    cufft_stub::dft2d(buf, nx, ny, -1.0);
    cufftComplex* dst = out + (size_t)b * nx * nyr;
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nyr; ++j)
        dst[(size_t)i * nyr + j] = buf[(size_t)i * ny + j];
  }
  return CUFFT_SUCCESS;
}

inline cufftResult cufftExecC2R(cufftHandle plan, cufftComplex* in,
                                cufftReal* out) {
  const CufftStubPlan& p = cufft_stub_plans()[plan];
  int nx = p.nx, ny = p.ny, nyr = ny / 2 + 1;
  std::vector<cufftComplex> buf((size_t)nx * ny);
  for (int b = 0; b < p.batch; ++b) {
    const cufftComplex* src = in + (size_t)b * nx * nyr;
    // rebuild the full spectrum from the Hermitian half:
    // F[i, j] = conj(F[(nx−i) mod nx, (ny−j) mod ny])
    for (int i = 0; i < nx; ++i) {
      for (int j = 0; j < ny; ++j) {
        if (j < nyr) {
          buf[(size_t)i * ny + j] = src[(size_t)i * nyr + j];
        } else {
          const cufftComplex& m =
              src[(size_t)((nx - i) % nx) * nyr + (ny - j)];
          buf[(size_t)i * ny + j].x = m.x;
          buf[(size_t)i * ny + j].y = -m.y;
        }
      }
    }
    cufft_stub::dft2d(buf, nx, ny, 1.0);
    cufftReal* dst = out + (size_t)b * nx * ny;
    for (size_t i = 0; i < (size_t)nx * ny; ++i) dst[i] = buf[i].x;
  }
  return CUFFT_SUCCESS;
}

#endif  // REFSTUB_CUFFT_H_
