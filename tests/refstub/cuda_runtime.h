// CPU-emulation stub of the CUDA runtime, for executing the reference's
// CUDA translation units (/root/reference/source/{backproplib.cu,
// fft_backproplib.cu}) on this no-GPU rig as part of the executed-reference
// parity harness (tests/reference_build.py).
//
// Execution model: "device" memory is host memory; kernel launches run the
// kernel body serially over every (blockIdx, threadIdx) in the grid.  The
// reference's kernels are one-thread-per-output-element with no shared
// memory or synchronization on any live path (SURVEY.md §2.3/§2.4 — the
// only __shared__/__syncthreads__ user is the dead conv_k1 kernel), so
// serial execution is semantics-preserving.
//
// The <<<grid, block>>> launch syntax is not C++; tests/reference_build.py
// rewrites each launch `k<<<g, b>>>(args)` to `cuda_launch(g, b, k)(args)`
// in a generated build copy (never committed).  Everything in this header
// is original code.
#ifndef REFSTUB_CUDA_RUNTIME_H_
#define REFSTUB_CUDA_RUNTIME_H_

#include <cstdlib>
#include <cstring>

#define __global__
#define __device__
#define __host__
// `extern __shared__ T a[];` (dead conv_k1 only) degrades to an extern
// global array; definitions live in the shim.
#define __shared__

struct dim3 {
  unsigned x, y, z;
  dim3(unsigned x_ = 1, unsigned y_ = 1, unsigned z_ = 1)
      : x(x_), y(y_), z(z_) {}
};

// Thread-position globals referenced inside kernel bodies; the launcher
// sweeps them.  Single-threaded by design — the harness runs tiny shapes.
inline dim3& cuda_stub_threadIdx() { static dim3 v; return v; }
inline dim3& cuda_stub_blockIdx() { static dim3 v; return v; }
inline dim3& cuda_stub_blockDim() { static dim3 v; return v; }
inline dim3& cuda_stub_gridDim() { static dim3 v; return v; }
#define threadIdx cuda_stub_threadIdx()
#define blockIdx cuda_stub_blockIdx()
#define blockDim cuda_stub_blockDim()
#define gridDim cuda_stub_gridDim()

inline void __syncthreads() {}

template <class F>
struct CudaStubLauncher {
  dim3 grid, block;
  F* fn;
  template <class... A>
  void operator()(A... args) const {
    gridDim = grid;
    blockDim = block;
    for (unsigned bz = 0; bz < grid.z; ++bz)
      for (unsigned by = 0; by < grid.y; ++by)
        for (unsigned bx = 0; bx < grid.x; ++bx) {
          blockIdx = dim3(bx, by, bz);
          for (unsigned tz = 0; tz < block.z; ++tz)
            for (unsigned ty = 0; ty < block.y; ++ty)
              for (unsigned tx = 0; tx < block.x; ++tx) {
                threadIdx = dim3(tx, ty, tz);
                fn(args...);
              }
        }
  }
};

template <class F>
CudaStubLauncher<F> cuda_launch(dim3 grid, dim3 block, F* fn) {
  return CudaStubLauncher<F>{grid, block, fn};
}

// ---- memory + error surface (host memory throughout) ----
typedef int cudaError_t;
const cudaError_t cudaSuccess = 0;
enum cudaMemcpyKind {
  cudaMemcpyHostToDevice,
  cudaMemcpyDeviceToHost,
  cudaMemcpyDeviceToDevice,
  cudaMemcpyHostToHost,
};

template <class T>
cudaError_t cudaMalloc(T** p, size_t bytes) {
  *p = static_cast<T*>(std::malloc(bytes));
  return cudaSuccess;
}
template <class T>
cudaError_t cudaMallocHost(T** p, size_t bytes) {
  *p = static_cast<T*>(std::malloc(bytes));
  return cudaSuccess;
}
inline cudaError_t cudaFree(void* p) {
  std::free(p);
  return cudaSuccess;
}
inline cudaError_t cudaFreeHost(void* p) {
  std::free(p);
  return cudaSuccess;
}
inline cudaError_t cudaMemcpy(void* dst, const void* src, size_t bytes,
                              cudaMemcpyKind) {
  std::memcpy(dst, src, bytes);
  return cudaSuccess;
}
inline cudaError_t cudaMemset(void* p, int v, size_t bytes) {
  std::memset(p, v, bytes);
  return cudaSuccess;
}
inline cudaError_t cudaDeviceSynchronize() { return cudaSuccess; }

#endif  // REFSTUB_CUDA_RUNTIME_H_
