// cuComplex stub: fft_backproplib.cu uses cuCabsf in its (dead) display
// kernel; types live in cufft.h.
#ifndef REFSTUB_CUCOMPLEX_H_
#define REFSTUB_CUCOMPLEX_H_
#include <cmath>
#include "cufft.h"
typedef cufftComplex cuFloatComplex;
inline float cuCabsf(cuFloatComplex z) { return std::hypot(z.x, z.y); }
#endif  // REFSTUB_CUCOMPLEX_H_
