// Head-to-head driver for the REFERENCE library (headers at /root/reference).
// Generates the same 5-point 2-D Poisson operator as
// hifir_tpu/models/problems.py:poisson2d and times HIF<double,int>::factorize
// with the robust default parameters (reference src/hif/Options.h:135-163).
// Prints one line per rep: "rep <i> factorize <seconds> nnzM <nnz> levels <L>".
//
// Build (see h2h.sh):
//   g++ -O3 -ffast-math -fopenmp -I/root/reference/src ref_factorize.cpp \
//       -o ref_factorize.exe -l:liblapack.so.3 -l:libblas.so.3
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "hifir.hpp"

using prec_t = hif::HIF<double, int>;
using crs_t  = prec_t::crs_type;

int main(int argc, char **argv) {
  const int nx   = argc > 1 ? std::atoi(argv[1]) : 1024;
  const int reps = argc > 2 ? std::atoi(argv[2]) : 1;
  // argv[3] = "convdiff" selects the nonsymmetric upwind stencil
  // (hifir_tpu/models/problems.py:convdiff2d, wind (10, 20))
  const bool convdiff = argc > 3 && argv[3][0] == 'c';
  const long n   = (long)nx * nx;

  std::vector<long>   indptr(n + 1);  // reference IndPtrType defaults to long
  std::vector<int>    indices;
  std::vector<double> vals;
  indices.reserve(5 * n);
  vals.reserve(5 * n);
  indptr[0] = 0;
  const double h = 1.0 / (nx + 1), bx = 10.0, by = 20.0;
  const double diag  = convdiff ? 4.0 + h * (bx + by) : 4.0;
  const double west  = convdiff ? -(1.0 + h * bx) : -1.0;
  const double east  = -1.0;
  const double south = convdiff ? -(1.0 + h * by) : -1.0;
  const double north = -1.0;
  for (long i = 0; i < n; ++i) {
    const long x = i % nx, y = i / nx;
    if (y > 0) { indices.push_back((int)(i - nx)); vals.push_back(south); }
    if (x > 0) { indices.push_back((int)(i - 1));  vals.push_back(west); }
    indices.push_back((int)i); vals.push_back(diag);
    if (x < nx - 1) { indices.push_back((int)(i + 1));  vals.push_back(east); }
    if (y < nx - 1) { indices.push_back((int)(i + nx)); vals.push_back(north); }
    indptr[i + 1] = (long)indices.size();
  }
  crs_t A((hif::CRS<double, int>::size_type)n,
          (hif::CRS<double, int>::size_type)n, indptr.data(), indices.data(),
          vals.data(), true);

  auto opts = hif::get_default_options();  // robust defaults
  opts.verbose = hif::VERBOSE_NONE;

  for (int r = 0; r < reps; ++r) {
    prec_t M;
    const auto t0 = std::chrono::steady_clock::now();
    M.factorize(A, opts);
    const auto t1 = std::chrono::steady_clock::now();
    const double dt = std::chrono::duration<double>(t1 - t0).count();
    std::printf("rep %d factorize %.3f nnzM %zu levels %zu\n", r, dt,
                (size_t)M.nnz(), (size_t)M.levels());
    std::fflush(stdout);
  }
  return 0;
}
