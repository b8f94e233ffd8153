// Scanline polygon rasterizer for GDS mask generation.
//
// Fills an int32 winding-accumulation grid for one polygon at a time:
// for every grid row, the x-crossings of the polygon edges with the row's
// cell-center line are computed with their crossing direction; sweeping the
// sorted crossings yields the winding number of every cell center on that
// row in O(V + crossings·log) per row. The Python layer weights each
// polygon's contribution (+1 / −1) to implement orientation-aware cutouts
// and thresholds the accumulated winding (> 0 means material).
//
// Exposed as a tiny C ABI for ctypes; the numpy fallback in
// qpsim_tpu/geometry/raster.py computes identical results, slower.
//
// Build: make -C native   (produces libgdsraster.so next to this file)

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Accumulate `weight` times the winding number of `polygon` (n_pts x 2
// doubles) around every grid cell center into `accum` (ny*nx int32,
// row-major). Cell centers: x = x0 + (j + 0.5)*dx, y = y0 + (i + 0.5)*dy.
void gds_accumulate_winding(
    const double* polygon,
    int64_t n_pts,
    double x0,
    double y0,
    double dx,
    double dy,
    int64_t nx,
    int64_t ny,
    int32_t weight,
    int32_t* accum) {
  if (n_pts < 3) return;

  struct Crossing {
    double x;
    int dir;
  };
  std::vector<Crossing> crossings;
  crossings.reserve(16);

  for (int64_t i = 0; i < ny; ++i) {
    const double yc = y0 + (static_cast<double>(i) + 0.5) * dy;
    crossings.clear();

    for (int64_t e = 0; e < n_pts; ++e) {
      const double ax = polygon[2 * e];
      const double ay = polygon[2 * e + 1];
      const int64_t f = (e + 1 == n_pts) ? 0 : e + 1;
      const double bx = polygon[2 * f];
      const double by = polygon[2 * f + 1];
      // half-open rule [min, max): horizontal edges and vertex-grazing
      // double counts are excluded consistently.
      // The sweep accumulates crossings to the LEFT of each cell; the
      // winding number counts signed crossings of a rightward ray, so an
      // upward edge to the left contributes −1 and the residual after all
      // crossings is 0 for a closed contour. Hence up → −1, down → +1.
      if ((ay <= yc && by > yc)) {
        const double t = (yc - ay) / (by - ay);
        crossings.push_back({ax + t * (bx - ax), -1});
      } else if ((by <= yc && ay > yc)) {
        const double t = (yc - by) / (ay - by);
        crossings.push_back({bx + t * (ax - bx), +1});
      }
    }
    if (crossings.empty()) continue;
    std::sort(crossings.begin(), crossings.end(),
              [](const Crossing& a, const Crossing& b) { return a.x < b.x; });

    // walk cells and crossings together; winding accumulates left→right.
    // Cells with nonzero winding are INSIDE this contour (nonzero-winding
    // fill rule) and receive `weight` once — matching containment-based
    // accumulation, where a reversed-orientation contour with weight −1
    // carves a hole.
    int64_t j = 0;
    int winding = 0;
    int32_t* row = accum + i * nx;
    for (const Crossing& c : crossings) {
      while (j < nx && x0 + (static_cast<double>(j) + 0.5) * dx < c.x) {
        if (winding != 0) row[j] += weight;
        ++j;
      }
      winding += c.dir;
    }
    if (winding != 0) {
      for (; j < nx; ++j) row[j] += weight;
    }
  }
}

}  // extern "C"
