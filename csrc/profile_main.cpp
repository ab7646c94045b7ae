// Standalone native profiling driver — the rebuild of the reference's
// perf/FlameGraph rig (reference: profiling/main.cpp:5-16 +
// profiling/CMakeLists.txt, which built a -O3 -g binary calling the L3 op
// directly so `perf record --call-graph dwarf` could profile the kernel
// without Python in the stack).
//
// This binary drives the same native table builder the library uses
// (csrc/aa_tables.cpp) plus a reference CPU separable resize, so the
// host-side cost model (table build O(out*ntaps), two banded passes) can be
// profiled and sanity-checked natively.  The TPU kernels themselves are
// profiled with `cli.py --profile` (jax.profiler); this covers the
// host/native side and doubles as a no-Python smoke test of the C++ layer.
//
// Build:  c++ -O3 -g -o aa_profile csrc/profile_main.cpp csrc/aa_tables.cpp
//   or:   cmake -S csrc -B build && cmake --build build
// Run:    ./aa_profile [H W OH OW iters mode]
//         ./aa_profile --selftest
// Perf:   perf record -F 9999 --call-graph dwarf ./aa_profile 438 906 196 320 200
//         perf script | stackcollapse-perf.pl | flamegraph.pl > flame.svg
// ASAN:   c++ -O1 -g -fsanitize=address -fno-omit-frame-pointer ... (the
//         reference's memory-safety recipe, README.md:509-520)

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int32_t aa_ntaps(int64_t in_size, int64_t out_size, int32_t filter,
                 int32_t antialias, int32_t align_corners);
void aa_compute_tables_v2(int64_t in_size, int64_t out_size, int32_t filter,
                          int32_t antialias, int32_t align_corners,
                          int32_t border, int32_t* xmin_out, int32_t* size_out,
                          double* weights_out);
}

namespace {

struct Tables {
  std::vector<int32_t> xmin, size;
  std::vector<double> w;
  int32_t ntaps = 0;
};

Tables build_tables(int64_t in, int64_t out, int32_t filter) {
  Tables t;
  t.ntaps = aa_ntaps(in, out, filter, /*antialias=*/1, /*align_corners=*/0);
  t.xmin.resize(out);
  t.size.resize(out);
  t.w.resize(out * t.ntaps);
  aa_compute_tables_v2(in, out, filter, 1, 0, /*border=renorm*/ 0,
                       t.xmin.data(), t.size.data(), t.w.data());
  return t;
}

// One 1-D banded pass over the last axis: y[r, o] = sum_j w[o,j] x[r, xmin[o]+j]
// (the reference's hot loop, interpolate_aa_single_dim, in its simplest
// correct form — this is deliberately the *naive* formulation so profiles
// show the un-tuned cost the banded-MXU design replaces).
void pass_last(const double* x, int64_t rows, int64_t in, const Tables& t,
               int64_t out, double* y) {
  for (int64_t r = 0; r < rows; ++r) {
    const double* xr = x + r * in;
    double* yr = y + r * out;
    for (int64_t o = 0; o < out; ++o) {
      const double* w = t.w.data() + o * t.ntaps;
      const double* xs = xr + t.xmin[o];
      double acc = 0.0;
      for (int32_t j = 0; j < t.size[o]; ++j) acc += w[j] * xs[j];
      yr[o] = acc;
    }
  }
}

// Separable resize of a CxHxW plane stack: W pass then H pass (the
// reference's pass order, step_two_dot_two/aa_interpolation_impl.h:655-679).
void resize_chw(const double* x, int64_t C, int64_t H, int64_t W,
                const Tables& th, const Tables& tw, int64_t OH, int64_t OW,
                double* tmp /*C*H*OW*/, double* out /*C*OH*OW*/) {
  pass_last(x, C * H, W, tw, OW, tmp);
  // H pass: operate on columns by transposing index arithmetic.
  for (int64_t c = 0; c < C; ++c) {
    const double* tc = tmp + c * H * OW;
    double* oc = out + c * OH * OW;
    for (int64_t o = 0; o < OH; ++o) {
      const double* w = th.w.data() + o * th.ntaps;
      const int64_t x0 = th.xmin[o];
      for (int64_t u = 0; u < OW; ++u) {
        double acc = 0.0;
        for (int32_t j = 0; j < th.size[o]; ++j)
          acc += w[j] * tc[(x0 + j) * OW + u];
        oc[o * OW + u] = acc;
      }
    }
  }
}

int filter_id(const std::string& mode) {
  if (mode == "bilinear") return 0;
  if (mode == "box" || mode == "nearest") return 1;
  if (mode == "bicubic") return 2;
  if (mode == "lanczos3") return 3;
  std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
  std::exit(2);
}

int selftest() {
  // Deterministic ramp image; print stats a Python test can cross-check
  // against the numpy/JAX oracle.
  const int64_t C = 3, H = 57, W = 83, OH = 24, OW = 31;
  std::vector<double> x(C * H * W);
  for (int64_t i = 0; i < (int64_t)x.size(); ++i)
    x[i] = double((i * 7919) % 256);
  Tables th = build_tables(H, OH, 0), tw = build_tables(W, OW, 0);
  std::vector<double> tmp(C * H * OW), y(C * OH * OW);
  resize_chw(x.data(), C, H, W, th, tw, OH, OW, tmp.data(), y.data());
  double mean = 0.0, mx = -1e30;
  for (double v : y) {
    mean += v;
    if (v > mx) mx = v;
  }
  mean /= double(y.size());
  std::printf("selftest mean=%.10f max=%.10f n=%zu\n", mean, mx, y.size());
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc >= 2 && std::strcmp(argv[1], "--selftest") == 0) return selftest();
  int64_t H = 438, W = 906, OH = 196, OW = 320, iters = 100;
  std::string mode = "bilinear";
  if (argc >= 5) {
    H = std::atoll(argv[1]);
    W = std::atoll(argv[2]);
    OH = std::atoll(argv[3]);
    OW = std::atoll(argv[4]);
  }
  if (argc >= 6) iters = std::atoll(argv[5]);
  if (argc >= 7) mode = argv[6];
  const int fid = filter_id(mode);
  const int64_t C = 3;

  std::vector<double> x(C * H * W);
  for (int64_t i = 0; i < (int64_t)x.size(); ++i)
    x[i] = double((i * 2654435761u) % 256);
  std::vector<double> tmp(C * H * OW), y(C * OH * OW);

  auto t0 = std::chrono::steady_clock::now();
  Tables th, tw;
  for (int64_t it = 0; it < iters; ++it) {
    // rebuild tables every call, like the reference op does per invocation
    th = build_tables(H, OH, fid);
    tw = build_tables(W, OW, fid);
    resize_chw(x.data(), C, H, W, th, tw, OH, OW, tmp.data(), y.data());
  }
  auto t1 = std::chrono::steady_clock::now();
  const double s =
      std::chrono::duration_cast<std::chrono::duration<double>>(t1 - t0)
          .count() /
      double(iters);
  std::printf(
      "{\"config\": \"%lldx%lld->%lldx%lld %s C=3 f64\", \"ms\": %.3f, "
      "\"out_Mpix_s\": %.2f, \"ntaps_h\": %d, \"ntaps_w\": %d}\n",
      (long long)H, (long long)W, (long long)OH, (long long)OW, mode.c_str(),
      s * 1e3, double(OH * OW) / s / 1e6, th.ntaps, tw.ntaps);
  return 0;
}
