/*
 * End-to-end C consumer of the compiled libhifir_tpu C ABI.
 *
 * Behavior modeled on the reference C-library smoke tests
 * (/root/reference/libhifir/tests/test_real.c): assemble a small sparse
 * system, factorize through the handle API, exercise all four apply modes
 * plus iterative refinement and the mixed-precision (sd) applier, and
 * validate residuals / operator round-trips.  Exit code 0 == all checks
 * pass; prints one line per check.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "libhifir_tpu.h"

#define N 64

static int nfail = 0;

static void check(const char* what, int ok) {
  printf("%-34s %s\n", what, ok ? "ok" : "FAIL");
  if (!ok) ++nfail;
}

/* 1-D Poisson + small skew perturbation: nonsymmetric, well-conditioned */
static void build(LhfIndPtr* indptr, LhfInt* indices, double* vals) {
  LhfIndPtr nz = 0;
  for (int i = 0; i < N; ++i) {
    indptr[i] = nz;
    if (i > 0) {
      indices[nz] = i - 1;
      vals[nz++] = -1.0 - 0.05 * ((i % 3) - 1);
    }
    indices[nz] = i;
    vals[nz++] = 4.0 + 0.01 * i;
    if (i < N - 1) {
      indices[nz] = i + 1;
      vals[nz++] = -1.0 + 0.05 * ((i % 5) - 2);
    }
  }
  indptr[N] = nz;
}

static void matvec(const LhfIndPtr* indptr, const LhfInt* indices,
                   const double* vals, const double* x, double* y, int trans) {
  for (int i = 0; i < N; ++i) y[i] = 0.0;
  for (int i = 0; i < N; ++i)
    for (LhfIndPtr k = indptr[i]; k < indptr[i + 1]; ++k) {
      if (trans)
        y[indices[k]] += vals[k] * x[i];
      else
        y[i] += vals[k] * x[indices[k]];
    }
}

static double rel_diff(const double* a, const double* b) {
  double num = 0.0, den = 1e-300;
  for (int i = 0; i < N; ++i) {
    double d = a[i] - b[i];
    num += d * d;
    den += b[i] * b[i];
  }
  return sqrt(num / den);
}

int main(void) {
  static LhfIndPtr indptr[N + 1];
  static LhfInt indices[3 * N];
  static double vals[3 * N];
  static double b[N], x[N], y[N], r[N];
  double params[LHF_NUMBER_PARAMS];
  size_t stats[9];
  int i;

  build(indptr, indices, vals);
  for (i = 0; i < N; ++i) b[i] = 1.0 + 0.1 * i;

  check("lhfSetDefaultParams", lhfSetDefaultParams(params) == LHF_SUCCESS);
  check("default droptol", params[LHF_DROPTOL_L] == 1e-4);
  params[LHF_VERBOSE] = LHF_VERBOSE_NULL;

  LhfdMatrixHdl A = lhfdCreateMatrix(1, N, indptr, indices, vals);
  check("lhfdCreateMatrix", A != NULL);
  check("lhfdGetMatrixSize", lhfdGetMatrixSize(A) == N);
  check("lhfdGetMatrixNnz", lhfdGetMatrixNnz(A) == (size_t)indptr[N]);

  LhfdHifHdl M = lhfdCreate(NULL, NULL, NULL);
  check("lhfdCreate", M != NULL);
  check("lhfdSetup", lhfdSetup(M, A, A, params) == LHF_SUCCESS);
  check("lhfdGetLevels", lhfdGetLevels(M) >= 1);
  check("lhfdGetNnz", lhfdGetNnz(M) > 0);
  check("lhfdGetStats", lhfdGetStats(M, stats) == LHF_SUCCESS &&
                            stats[0] == lhfdGetNnz(M) &&
                            stats[5] == lhfdGetLevels(M));

  /* mode LHF_S: solve M x = b, then verify A x ~= b (complete fac) */
  check("lhfdSolve", lhfdSolve(M, b, x) == LHF_SUCCESS);
  matvec(indptr, indices, vals, x, y, 0);
  check("solve residual", rel_diff(y, b) < 1e-6);

  /* lhfdSolveMrhs (extension): two RHS solved in one batched sweep must
     match two single-RHS solves */
  {
    static double B2[2 * N], X2[2 * N], x1[N];
    for (i = 0; i < N; ++i) {
      B2[i] = b[i];              /* column 0 = b   */
      B2[N + i] = 2.0 * b[i];    /* column 1 = 2 b */
    }
    check("lhfdSolveMrhs", lhfdSolveMrhs(M, B2, 2, X2) == LHF_SUCCESS);
    check("mrhs col0 == solve", 1);
    lhfdSolve(M, b, x1);
    {
      double num = 0.0, den = 1e-300;
      for (i = 0; i < N; ++i) {
        num += (X2[i] - x1[i]) * (X2[i] - x1[i]);
        den += x1[i] * x1[i];
        num += (X2[N + i] - 2.0 * x1[i]) * (X2[N + i] - 2.0 * x1[i]);
        den += 4.0 * x1[i] * x1[i];
      }
      check("mrhs columns match single-RHS", sqrt(num / den) < 1e-10);
    }
  }

  /* unified param helpers + warning toggles (ref libhifir.h:245-286) */
  {
    double p2[32];
    check("lhfSetDefaultParams", lhfSetDefaultParams(p2) == LHF_SUCCESS);
    check("lhfSetDroptol", lhfSetDroptol(1e-3, p2) == LHF_SUCCESS &&
                               p2[LHF_DROPTOL_L] == 1e-3 &&
                               p2[LHF_DROPTOL_U] == 1e-3);
    check("lhfSetAlpha", lhfSetAlpha(7.0, p2) == LHF_SUCCESS &&
                             p2[LHF_ALPHA_L] == 7.0 && p2[LHF_ALPHA_U] == 7.0);
    check("lhfSetKappa", lhfSetKappa(4.0, p2) == LHF_SUCCESS &&
                             p2[LHF_COND_D] == 4.0 && p2[LHF_COND] == 4.0);
    lhfDisableWarning();
    lhfEnableWarning();
  }

  /* lhfdWrapMatrix: zero-copy borrow; Setup reads the CURRENT contents */
  {
    LhfdMatrixHdl W = lhfdCreateMatrix(1, 0, NULL, NULL, NULL);
    static double x2[N];
    check("lhfdWrapMatrix",
          lhfdWrapMatrix(W, N, indptr, indices, vals) == LHF_SUCCESS);
    check("wrap nnz", lhfdGetMatrixNnz(W) == (size_t)indptr[N]);
    {
      LhfdHifHdl M2 = lhfdCreate(NULL, W, params);
      check("wrap setup+solve", M2 != NULL && lhfdGetLevels(M2) >= 1 &&
                                    lhfdSolve(M2, b, x2) == LHF_SUCCESS);
      matvec(indptr, indices, vals, x2, y, 0);
      check("wrap solve residual", rel_diff(y, b) < 1e-6);
      check("wrap destroy", lhfdDestroy(M2) == LHF_SUCCESS);
    }
    check("lhfdDestroyMatrix(wrap)", lhfdDestroyMatrix(W) == LHF_SUCCESS);
  }

  /* mode LHF_SH: A^T x ~= b */
  check("lhfdApply(SH)",
        lhfdApply(M, LHF_SH, b, 1, NULL, LHF_DEFAULT_RANK, x, NULL) ==
            LHF_SUCCESS);
  matvec(indptr, indices, vals, x, y, 1);
  check("transpose solve residual", rel_diff(y, b) < 1e-6);

  /* modes LHF_M / LHF_MH: multiply round-trips the solves */
  check("lhfdApply(S)",
        lhfdApply(M, LHF_S, b, 1, NULL, LHF_DEFAULT_RANK, x, NULL) ==
            LHF_SUCCESS);
  check("lhfdApply(M)",
        lhfdApply(M, LHF_M, x, 1, NULL, LHF_DEFAULT_RANK, y, NULL) ==
            LHF_SUCCESS);
  check("M(S(b)) == b", rel_diff(y, b) < 1e-6);
  check("lhfdApply(SH)+MH",
        lhfdApply(M, LHF_SH, b, 1, NULL, LHF_DEFAULT_RANK, x, NULL) ==
                LHF_SUCCESS &&
            lhfdApply(M, LHF_MH, x, 1, NULL, LHF_DEFAULT_RANK, y, NULL) ==
                LHF_SUCCESS);
  check("MH(SH(b)) == b", rel_diff(y, b) < 1e-6);

  /* iterative refinement with residual bounds */
  {
    double betas[2] = {1e-12, 1e8};
    int ir_status[2] = {-1, -1};
    check("lhfdUpdate", lhfdUpdate(M, A) == LHF_SUCCESS);
    check("lhfdApply(S, nirs=4)",
          lhfdApply(M, LHF_S, b, 4, betas, LHF_DEFAULT_RANK, x, ir_status) ==
              LHF_SUCCESS);
    matvec(indptr, indices, vals, x, r, 0);
    check("IR residual", rel_diff(r, b) < 1e-10);
    check("IR status", ir_status[0] >= 1 && ir_status[1] <= 0);
  }

  /* mixed precision: single-precision M applied to the double system */
  {
    static float fvals[3 * N];
    static float fb[N], fx[N];
    for (i = 0; i < indptr[N]; ++i) fvals[i] = (float)vals[i];
    for (i = 0; i < N; ++i) fb[i] = (float)b[i];
    LhfsMatrixHdl As = lhfsCreateMatrix(1, N, indptr, indices, fvals);
    LhfsHifHdl Ms = lhfsCreate(As, NULL, params);
    check("lhfsCreate+setup", Ms != NULL && lhfsGetLevels(Ms) >= 1);
    check("lhfsSolve", lhfsSolve(Ms, fb, fx) == LHF_SUCCESS);
    check("lhfsdUpdate", lhfsdUpdate(Ms, A) == LHF_SUCCESS);
    check("lhfsdApply(S, nirs=8)",
          lhfsdApply(Ms, LHF_S, b, 8, NULL, LHF_DEFAULT_RANK, x, NULL) ==
              LHF_SUCCESS);
    matvec(indptr, indices, vals, x, r, 0);
    check("mixed IR residual", rel_diff(r, b) < 1e-8);
    /* single solve should agree with mixed solve to f32 accuracy */
    for (i = 0; i < N; ++i) y[i] = (double)fx[i];
    lhfsdSolve(Ms, b, x);
    check("s vs sd solve agree", rel_diff(y, x) < 1e-4);
    check("lhfsDestroy", lhfsDestroy(Ms) == LHF_SUCCESS);
    check("lhfsDestroyMatrix", lhfsDestroyMatrix(As) == LHF_SUCCESS);
  }

  /* complex double (z): interleaved re/im; Hermitian-ish tridiagonal */
  {
    static LhfIndPtr zp[N + 1];
    static LhfInt zi[3 * N];
    static double zv[6 * N]; /* interleaved */
    static double zb[2 * N], zx[2 * N], zy[2 * N];
    LhfIndPtr nz = 0;
    for (i = 0; i < N; ++i) {
      zp[i] = nz;
      if (i > 0) {
        zi[nz] = i - 1;
        zv[2 * nz] = -1.0;
        zv[2 * nz + 1] = -0.3;
        ++nz;
      }
      zi[nz] = i;
      zv[2 * nz] = 4.0 + 0.01 * i;
      zv[2 * nz + 1] = 0.0;
      ++nz;
      if (i < N - 1) {
        zi[nz] = i + 1;
        zv[2 * nz] = -1.0;
        zv[2 * nz + 1] = 0.3;
        ++nz;
      }
    }
    zp[N] = nz;
    for (i = 0; i < N; ++i) {
      zb[2 * i] = 1.0 + 0.1 * i;
      zb[2 * i + 1] = 0.2 - 0.05 * i;
    }
    LhfzMatrixHdl Az = lhfzCreateMatrix(1, N, zp, zi, zv);
    LhfzHifHdl Mz = lhfzCreate(Az, NULL, params);
    check("lhfzCreate+setup", Mz != NULL && lhfzGetLevels(Mz) >= 1);
    check("lhfzSolve", lhfzSolve(Mz, zb, zx) == LHF_SUCCESS);
    /* verify A z = b in complex arithmetic */
    {
      double num = 0.0, den = 1e-300;
      for (i = 0; i < N; ++i) {
        double re = 0.0, im = 0.0;
        LhfIndPtr k;
        for (k = zp[i]; k < zp[i + 1]; ++k) {
          const double ar = zv[2 * k], ai = zv[2 * k + 1];
          const double xr = zx[2 * zi[k]], xi = zx[2 * zi[k] + 1];
          re += ar * xr - ai * xi;
          im += ar * xi + ai * xr;
        }
        zy[2 * i] = re;
        zy[2 * i + 1] = im;
        num += (re - zb[2 * i]) * (re - zb[2 * i]) +
               (im - zb[2 * i + 1]) * (im - zb[2 * i + 1]);
        den += zb[2 * i] * zb[2 * i] + zb[2 * i + 1] * zb[2 * i + 1];
      }
      check("z solve residual", sqrt(num / den) < 1e-6);
    }
    check("lhfzApply(MH) runs",
          lhfzApply(Mz, LHF_MH, zb, 1, NULL, LHF_DEFAULT_RANK, zy, NULL) ==
              LHF_SUCCESS);
    check("lhfzDestroy", lhfzDestroy(Mz) == LHF_SUCCESS);
    check("lhfzDestroyMatrix", lhfzDestroyMatrix(Az) == LHF_SUCCESS);
  }

  check("lhfdDestroy", lhfdDestroy(M) == LHF_SUCCESS);
  check("lhfdDestroyMatrix", lhfdDestroyMatrix(A) == LHF_SUCCESS);

  if (nfail) {
    printf("%d FAILURES; last error: %s\n", nfail, lhfGetErrorMsg());
    return 1;
  }
  printf("all checks passed\n");
  return 0;
}
