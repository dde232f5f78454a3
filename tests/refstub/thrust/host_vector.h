// CPU-emulation stub of the Thrust surface used by the reference
// (host/device vectors, raw_pointer_cast, reduce, copy — SURVEY.md §2.3,
// §2.4).  "Device" vectors are host vectors; reductions are sequential
// std::accumulate (the reference's tree reduction differs only in fp
// rounding order, covered by test tolerances).  All original code.
#ifndef REFSTUB_THRUST_HOST_VECTOR_H_
#define REFSTUB_THRUST_HOST_VECTOR_H_

#include <numeric>
#include <vector>

namespace thrust {

template <class T>
using host_vector = std::vector<T>;

template <class T>
using device_vector = std::vector<T>;

template <class T>
T* raw_pointer_cast(T* p) {
  return p;
}

template <class It>
typename std::iterator_traits<It>::value_type reduce(It first, It last) {
  typename std::iterator_traits<It>::value_type init{};
  return std::accumulate(first, last, init);
}

template <class It, class Out>
Out copy(It first, It last, Out out) {
  return std::copy(first, last, out);
}

}  // namespace thrust

#endif  // REFSTUB_THRUST_HOST_VECTOR_H_
