// Host rasterization: keep-nearest scatter-min onto the range-image grid.
//
// The production encode path projects on the host (binning in numpy, this
// loop in C++) and uploads the (H, W) range image — 3x fewer bytes than the
// raw cloud and no device-side compaction sorts.  Semantics match the
// reference host kernel (cpp_modules.cpp:459-460: write if empty or strictly
// nearer — first writer wins exact ties) and the device sort path
// (ops/projection.py::_scatter_min_image).

#include <cstdint>

extern "C" void raster_scatter_min(const float *depth, const int32_t *idx,
                                   int64_t n, float *ri, int64_t hw) {
  for (int64_t i = 0; i < n; ++i) {
    float d = depth[i];
    if (!(d > 0.0f)) continue;  // padding / degenerate points never write
    int32_t k = idx[i];
    if (k < 0 || k >= hw) continue;
    float cur = ri[k];
    if (cur == 0.0f || d < cur) ri[k] = d;
  }
}
