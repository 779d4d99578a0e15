/* End-to-end C API test (the transi_test_* analogue,
 * reference tests/transi/transi_test_invtrans.c): setup at T47/O48,
 * spectral -> grid -> spectral round trip, tolerance gate. */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "ectrans_tpu.h"

int main(void) {
  if (ectrans_tpu_init() != 0) {
    fprintf(stderr, "init failed\n");
    return 1;
  }
  int h = ectrans_tpu_setup("O48", 47);
  if (h < 0) {
    fprintf(stderr, "setup failed: %d\n", h);
    return 1;
  }
  int nspec2, ngptot, ndgl, ndlon, nsmax;
  if (ectrans_tpu_inquire(h, &nspec2, &ngptot, &ndgl, &ndlon, &nsmax) != 0)
    return 1;
  printf("T%d: nspec2=%d ngptot=%d ndgl=%d ndlon=%d\n", nsmax, nspec2,
         ngptot, ndgl, ndlon);

  const int nfld = 2;
  double *spec = calloc((size_t)nfld * nspec2, sizeof(double));
  double *gp = calloc((size_t)nfld * ngptot, sizeof(double));
  double *spec2 = calloc((size_t)nfld * nspec2, sizeof(double));
  /* random-ish spectral state with zero m=0 imaginary parts */
  srand(7);
  for (int f = 0; f < nfld; ++f)
    for (int i = 0; i < nspec2; ++i)
      spec[f * nspec2 + i] =
          (i < 2 * (nsmax + 1) && (i & 1)) ? 0.0
                                           : (rand() / (double)RAND_MAX - 0.5);

  if (ectrans_tpu_invtrans(h, nfld, spec, gp) != 0) return 1;
  if (ectrans_tpu_dirtrans(h, nfld, gp, spec2) != 0) return 1;

  double err = 0.0;
  for (int i = 0; i < nfld * nspec2; ++i) {
    double d = fabs(spec2[i] - spec[i]);
    if (d > err) err = d;
  }
  printf("roundtrip max err: %.3e\n", err);

  double norms[2];
  if (ectrans_tpu_specnorm(h, nfld, spec, norms) != 0) return 1;
  printf("specnorms: %.6f %.6f\n", norms[0], norms[1]);

  /* adjoint identity <F x, y> == <x, F^T y> for the inverse transform */
  double *y = calloc((size_t)nfld * ngptot, sizeof(double));
  double *xt = calloc((size_t)nfld * nspec2, sizeof(double));
  for (int i = 0; i < nfld * ngptot; ++i)
    y[i] = rand() / (double)RAND_MAX - 0.5;
  if (ectrans_tpu_invtrans_adj(h, nfld, y, xt) != 0) return 1;
  double lhs = 0.0, rhs = 0.0;
  for (int i = 0; i < nfld * ngptot; ++i) lhs += gp[i] * y[i];
  for (int i = 0; i < nfld * nspec2; ++i) rhs += spec[i] * xt[i];
  printf("adjoint identity: lhs %.9e rhs %.9e\n", lhs, rhs);
  if (fabs(lhs - rhs) > 1e-9 * fabs(lhs)) {
    fprintf(stderr, "FAIL: adjoint identity\n");
    return 3;
  }
  free(y);
  free(xt);

  ectrans_tpu_release(h);
  ectrans_tpu_finalize();
  free(spec);
  free(gp);
  free(spec2);
  if (err > 1e-7) {
    fprintf(stderr, "FAIL: roundtrip error too large\n");
    return 2;
  }
  printf("C API test OK\n");
  return 0;
}
