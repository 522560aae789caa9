// Native host kernels for the data path.
//
// The reference delegates its native-performance host work to C++ dependencies
// (SimpleITK I/O, scipy's C label()); this module supplies the framework's own
// native equivalents for the two hottest host-side loops:
//
//   1. cc3d_label:     6-connected 3D connected-component labeling
//                      (union-find, two-pass), used by postprocessing
//                      (largest-component removal) and cascade corruption.
//   2. largest_component_sizes: per-component voxel counts in one pass.
//
// Exposed with C linkage for ctypes (no pybind11 dependency). Build:
//   g++ -O3 -march=native -shared -fPIC -o libmtt_native.so cc3d.cpp
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b] = a;
  }
};

}  // namespace

extern "C" {

// mask: (nz*ny*nx) uint8; labels_out: same size int32 (0 = background).
// Returns the number of components.
int32_t cc3d_label(const uint8_t* mask, int32_t* labels_out, int64_t nz,
                   int64_t ny, int64_t nx) {
  const int64_t n = nz * ny * nx;
  std::memset(labels_out, 0, sizeof(int32_t) * n);
  // first pass: provisional labels + equivalences (6-connectivity, scan order)
  UnionFind uf(1);
  uf.parent.reserve(1024);
  int32_t next = 1;
  std::vector<int32_t>& parent = uf.parent;
  for (int64_t z = 0; z < nz; ++z) {
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t row = (z * ny + y) * nx;
      for (int64_t x = 0; x < nx; ++x) {
        const int64_t i = row + x;
        if (!mask[i]) continue;
        int32_t lz = (z > 0 && mask[i - ny * nx]) ? labels_out[i - ny * nx] : 0;
        int32_t ly = (y > 0 && mask[i - nx]) ? labels_out[i - nx] : 0;
        int32_t lx = (x > 0 && mask[i - 1]) ? labels_out[i - 1] : 0;
        int32_t l = 0;
        if (lz) l = lz;
        if (ly) l = l ? l : ly;
        if (lx) l = l ? l : lx;
        if (!l) {
          l = next++;
          parent.push_back(l);
        } else {
          if (lz && lz != l) uf.unite(l, lz);
          if (ly && ly != l) uf.unite(l, ly);
          if (lx && lx != l) uf.unite(l, lx);
        }
        labels_out[i] = l;
      }
    }
  }
  // second pass: flatten equivalences into dense labels
  std::vector<int32_t> dense(next, 0);
  int32_t count = 0;
  for (int32_t l = 1; l < next; ++l) {
    const int32_t root = uf.find(l);
    if (!dense[root]) dense[root] = ++count;
    dense[l] = dense[root];
  }
  for (int64_t i = 0; i < n; ++i) {
    if (labels_out[i]) labels_out[i] = dense[labels_out[i]];
  }
  return count;
}

// labels: int32 (0..num_components); sizes_out: (num_components) int64
void component_sizes(const int32_t* labels, int64_t n, int32_t num_components,
                     int64_t* sizes_out) {
  std::memset(sizes_out, 0, sizeof(int64_t) * num_components);
  for (int64_t i = 0; i < n; ++i) {
    if (labels[i] > 0) sizes_out[labels[i] - 1] += 1;
  }
}

// keep only the component with the most voxels: zero all other mask voxels.
// Returns the kept component's size.
int64_t keep_largest_component(uint8_t* mask, int32_t* scratch_labels, int64_t nz,
                               int64_t ny, int64_t nx) {
  const int32_t ncomp = cc3d_label(mask, scratch_labels, nz, ny, nx);
  if (ncomp <= 1) {
    int64_t total = 0;
    const int64_t n = nz * ny * nx;
    for (int64_t i = 0; i < n; ++i) total += mask[i] != 0;
    return total;
  }
  std::vector<int64_t> sizes(ncomp, 0);
  const int64_t n = nz * ny * nx;
  component_sizes(scratch_labels, n, ncomp, sizes.data());
  int32_t best = 0;
  for (int32_t c = 1; c < ncomp; ++c) {
    if (sizes[c] > sizes[best]) best = c;
  }
  for (int64_t i = 0; i < n; ++i) {
    if (mask[i] && scratch_labels[i] != best + 1) mask[i] = 0;
  }
  return sizes[best];
}

}  // extern "C"
