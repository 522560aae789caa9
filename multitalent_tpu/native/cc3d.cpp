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

// Expand bit-packed class masks (the device-side finalize_packed layout:
// per-voxel uint32 words, bit k of word k/32 = class k) into channel-major
// uint8 0/1 masks out[k * n_vox + v]. Voxel-blocked so each block's words
// stay in L1 while the per-class writes run sequentially; replaces a
// np.unpackbits + strided-astype chain that cost ~100 s per (256,320,320,47)
// volume on this host (numpy's bit loop, not memory bandwidth).
void unpack_class_bits(const uint32_t* in, uint8_t* out, int64_t n_vox,
                       int64_t n_words, int64_t n_classes) {
  // Voxel-blocked: deinterleave each block's words into an L1/L2-resident
  // scratch plane so the per-class inner loop is a pure elementwise
  // shift-and-mask over contiguous uint32 -> uint8 — the form the
  // auto-vectorizer turns into AVX2/AVX-512 shifts + byte packs. The naive
  // strided in[v * n_words + word] load defeated vectorization (~200 MB/s).
  const int64_t kBlock = 16384;
  std::vector<uint32_t> scratch(static_cast<size_t>(kBlock));
  for (int64_t w = 0; w < n_words; ++w) {
    const int64_t k_hi =
        (w + 1) * 32 < n_classes ? (w + 1) * 32 : n_classes;
    for (int64_t v0 = 0; v0 < n_vox; v0 += kBlock) {
      const int64_t v1 = v0 + kBlock < n_vox ? v0 + kBlock : n_vox;
      const int64_t nb = v1 - v0;
      uint32_t* sc = scratch.data();
      const uint32_t* src = in + v0 * n_words + w;
      for (int64_t v = 0; v < nb; ++v) sc[v] = src[v * n_words];
      for (int64_t k = w * 32; k < k_hi; ++k) {
        const uint32_t shift = static_cast<uint32_t>(k & 31);
        uint8_t* dst = out + k * n_vox + v0;
        for (int64_t v = 0; v < nb; ++v) {
          dst[v] = static_cast<uint8_t>((sc[v] >> shift) & 1u);
        }
      }
    }
  }
}

// Expand a run-length encoding (run start indices + per-run values) into a
// strided uint32 output: out[i * stride] = value of the run covering i, for
// i in [0, n). Replaces np.repeat(vals, diff(starts)) + a strided numpy
// assignment, whose fresh multi-hundred-MB intermediate pays the slow
// first-touch fault cost on this host class.
void rle_expand_u32(const int32_t* starts, const uint32_t* vals,
                    int64_t n_runs, int64_t n, uint32_t* out,
                    int64_t stride) {
  for (int64_t r = 0; r < n_runs; ++r) {
    const int64_t lo = starts[r];
    const int64_t hi = r + 1 < n_runs ? starts[r + 1] : n;
    const uint32_t v = vals[r];
    if (stride == 1) {
      for (int64_t i = lo; i < hi; ++i) out[i] = v;
    } else {
      for (int64_t i = lo; i < hi; ++i) out[i * stride] = v;
    }
  }
}

// Expand an alternating binary run-length encoding (start indices only; run
// r carries value first^(r&1)) into a contiguous uint8 0/1 array of length n.
// memset-per-run: binary masks are long-run dominated, so this writes at
// memory bandwidth where a np.repeat of per-run values pays a fresh
// first-touch-faulted intermediate.
void rle_expand_bits(const int32_t* starts, int64_t n_runs, int64_t n,
                     uint8_t first, uint8_t* out) {
  uint8_t v = first ? 1 : 0;
  for (int64_t r = 0; r < n_runs; ++r) {
    int64_t lo = starts[r];
    int64_t hi = r + 1 < n_runs ? starts[r + 1] : n;
    if (lo >= n) break;
    if (hi > n) hi = n;
    memset(out + lo, v, static_cast<size_t>(hi - lo));
    v ^= 1u;
  }
}

// Sparse variant: out arrives ZEROED (calloc — untouched zero pages), so
// only the value-1 runs are written. For organ-like masks (~0-3% fg) this
// touches ~25 MB instead of memsetting the whole multi-GB array — the dense
// expand's page-touch cost (3-6 s per bench volume on this host) was the
// last serialized piece of the mask fetch.
void rle_fill_ones(const int32_t* starts, int64_t n_runs, int64_t n,
                   uint8_t first, uint8_t* out) {
  for (int64_t r = (first ? 0 : 1); r < n_runs; r += 2) {
    int64_t lo = starts[r];
    int64_t hi = r + 1 < n_runs ? starts[r + 1] : n;
    if (lo >= n) break;
    if (hi > n) hi = n;
    memset(out + lo, 1, static_cast<size_t>(hi - lo));
  }
}

}  // extern "C"
