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

  /* gpnorm: [ave, min, max] per field */
  double gn[2 * 3];
  if (ectrans_tpu_gpnorm(h, nfld, gp, gn) != 0) return 1;
  printf("gpnorm f0: ave %.6f min %.6f max %.6f\n", gn[0], gn[1], gn[2]);
  if (!(gn[1] <= gn[0] && gn[0] <= gn[2])) {
    fprintf(stderr, "FAIL: gpnorm ordering\n");
    return 4;
  }

  /* vordiv_to_uv: pure spectral map, check it runs and is nonzero */
  double *spu = calloc((size_t)nfld * nspec2, sizeof(double));
  double *spv = calloc((size_t)nfld * nspec2, sizeof(double));
  if (ectrans_tpu_vordiv_to_uv(h, nfld, spec, spec, spu, spv) != 0) return 1;
  double su = 0.0;
  for (int i = 0; i < nfld * nspec2; ++i) su += fabs(spu[i]);
  if (su == 0.0) {
    fprintf(stderr, "FAIL: vordiv_to_uv all-zero\n");
    return 5;
  }
  free(spu);
  free(spv);

  /* dist/gath round-trip copies */
  double *gp2 = calloc((size_t)nfld * ngptot, sizeof(double));
  if (ectrans_tpu_distgrid(h, nfld, gp, gp2) != 0) return 1;
  if (ectrans_tpu_gathgrid(h, nfld, gp2, gp2) != 0) return 1;
  for (int i = 0; i < nfld * ngptot; ++i)
    if (gp2[i] != gp[i]) {
      fprintf(stderr, "FAIL: dist/gath grid copy\n");
      return 6;
    }
  free(gp2);

  /* lat-lon output mode */
  const int nlat = 19, nlon = 36;
  double *ll = calloc((size_t)nfld * nlat * nlon, sizeof(double));
  if (ectrans_tpu_invtrans_lonlat(h, nlat, nlon, nfld, spec, ll) != 0)
    return 1;
  double sll = 0.0;
  for (int i = 0; i < nfld * nlat * nlon; ++i) sll += fabs(ll[i]);
  if (sll == 0.0) {
    fprintf(stderr, "FAIL: lonlat output all-zero\n");
    return 7;
  }
  free(ll);

  /* single-precision entry points */
  float *specf = calloc((size_t)nfld * nspec2, sizeof(float));
  float *gpf = calloc((size_t)nfld * ngptot, sizeof(float));
  float *specf2 = calloc((size_t)nfld * nspec2, sizeof(float));
  for (int i = 0; i < nfld * nspec2; ++i) specf[i] = (float)spec[i];
  if (ectrans_tpu_invtrans_f(h, nfld, specf, gpf) != 0) return 1;
  if (ectrans_tpu_dirtrans_f(h, nfld, gpf, specf2) != 0) return 1;
  double errf = 0.0;
  for (int i = 0; i < nfld * nspec2; ++i) {
    double d = fabs((double)specf2[i] - (double)specf[i]);
    if (d > errf) errf = d;
  }
  printf("fp32 roundtrip max err: %.3e\n", errf);
  if (errf > 1e-4) {
    fprintf(stderr, "FAIL: fp32 roundtrip\n");
    return 8;
  }
  free(specf);
  free(gpf);
  free(specf2);

  /* full-option inverse with derivative flags + combined direct */
  {
    const int nvd = 1, nsca = 2;
    double *svor = calloc((size_t)nvd * nspec2, sizeof(double));
    double *sdiv = calloc((size_t)nvd * nspec2, sizeof(double));
    for (int i = 0; i < nspec2; ++i) {
      svor[i] = spec[i] * 0.5;
      sdiv[i] = spec[nspec2 + i] * 0.5;
    }
    /* vor+div+u+v + sc + nsd + ewu+ewv + ewsc = 2+2+2+2+2+2 = 12 rows */
    int nmax_out = 2 * nvd + 2 * nvd + 3 * nsca + 2 * nvd;
    double *gpo = calloc((size_t)nmax_out * ngptot, sizeof(double));
    int nout = ectrans_tpu_invtrans_full(h, nvd, nsca, svor, sdiv, spec,
                                         /*scders*/ 1, /*uvders*/ 1,
                                         /*vordivgp*/ 1, gpo);
    if (nout != nmax_out) {
      fprintf(stderr, "FAIL: invtrans_full nfld_out %d != %d\n", nout,
              nmax_out);
      return 11;
    }
    /* combined direct: U,V at rows 2,3 (after vor,div), scalars at 4,5 */
    double *gpin = calloc((size_t)(2 * nvd + nsca) * ngptot, sizeof(double));
    for (int i = 0; i < 2 * nvd * ngptot; ++i)
      gpin[i] = gpo[2 * nvd * ngptot + i];
    for (int i = 0; i < nsca * ngptot; ++i)
      gpin[2 * nvd * ngptot + i] = gpo[4 * nvd * ngptot + i];
    double *svor2 = calloc((size_t)nvd * nspec2, sizeof(double));
    double *sdiv2 = calloc((size_t)nvd * nspec2, sizeof(double));
    double *ssc2 = calloc((size_t)nsca * nspec2, sizeof(double));
    if (ectrans_tpu_dirtrans_full(h, nvd, nsca, gpin, svor2, sdiv2, ssc2) !=
        0)
      return 1;
    double ferr = 0.0;
    /* skip (m=0,n=0): global-mean vor/div carries no wind information */
    for (int i = 2; i < nvd * nspec2; ++i) {
      double d = fabs(svor2[i] - svor[i]) + fabs(sdiv2[i] - sdiv[i]);
      if (d > ferr) ferr = d;
    }
    for (int i = 0; i < nsca * nspec2; ++i) {
      double d = fabs(ssc2[i] - spec[i]);
      if (d > ferr) ferr = d;
    }
    printf("full-option roundtrip max err: %.3e\n", ferr);
    if (ferr > 1e-7) {
      fprintf(stderr, "FAIL: full-option roundtrip\n");
      return 12;
    }
    free(svor); free(sdiv); free(gpo); free(gpin);
    free(svor2); free(sdiv2); free(ssc2);
  }

  /* setup_ex: non-default radius rescales derivative-driven norms */
  {
    int h2 = ectrans_tpu_setup_ex("O48", 47, 6371229.0 * 2.0, -1.0);
    if (h2 < 0) {
      fprintf(stderr, "FAIL: setup_ex %d\n", h2);
      return 13;
    }
    /* same spectral state transforms identically (radius only scales
     * derivative/wind outputs, not the scalar synthesis) */
    double *gpr = calloc((size_t)nfld * ngptot, sizeof(double));
    if (ectrans_tpu_invtrans(h2, nfld, spec, gpr) != 0) return 1;
    double dmax = 0.0;
    for (int i = 0; i < nfld * ngptot; ++i) {
      double d = fabs(gpr[i] - gp[i]);
      if (d > dmax) dmax = d;
    }
    if (dmax > 1e-12) {
      fprintf(stderr, "FAIL: radius changed scalar synthesis (%.3e)\n", dmax);
      return 14;
    }
    /* winds scale with radius: u(radius*2) = 2 * u(radius) */
    double *u1 = calloc((size_t)ngptot, sizeof(double));
    double *v1 = calloc((size_t)ngptot, sizeof(double));
    double *u2 = calloc((size_t)ngptot, sizeof(double));
    double *v2 = calloc((size_t)ngptot, sizeof(double));
    if (ectrans_tpu_invtrans_vordiv(h, 1, spec, spec, u1, v1) != 0) return 1;
    if (ectrans_tpu_invtrans_vordiv(h2, 1, spec, spec, u2, v2) != 0) return 1;
    double wmax = 0.0, wscale = 0.0;
    for (int i = 0; i < ngptot; ++i) {
      double d = fabs(0.5 * u2[i] - u1[i]) + fabs(0.5 * v2[i] - v1[i]);
      if (d > wmax) wmax = d;
      if (fabs(u1[i]) > wscale) wscale = fabs(u1[i]);
    }
    wmax /= wscale;
    if (wmax > 1e-12) {
      fprintf(stderr, "FAIL: wind radius scaling (%.3e)\n", wmax);
      return 15;
    }
    free(gpr); free(u1); free(v1); free(u2); free(v2);
    ectrans_tpu_release(h2);
  }

  /* LAM surface: biperiodic domain round trip */
  int lh = ectrans_tpu_setup_lam(48, 40, 48, 40, -1, -1, 1000.0, 1000.0);
  if (lh < 0) {
    fprintf(stderr, "FAIL: setup_lam %d\n", lh);
    return 9;
  }
  int lnspec2, lngptot, lnx, lny;
  if (ectrans_tpu_inquire_lam(lh, &lnspec2, &lngptot, &lnx, &lny) != 0)
    return 1;
  printf("LAM: nspec2=%d ngptot=%d nx=%d ny=%d\n", lnspec2, lngptot, lnx, lny);
  double *lsp = calloc((size_t)lnspec2, sizeof(double));
  double *lgp = calloc((size_t)lngptot, sizeof(double));
  double *lsp2 = calloc((size_t)lnspec2, sizeof(double));
  lsp[4 * 3] = 1.0; /* one interior mode (4 reals per (m,n)) */
  if (ectrans_tpu_invtrans_lam(lh, 1, lsp, lgp) != 0) return 1;
  if (ectrans_tpu_dirtrans_lam(lh, 1, lgp, lsp2) != 0) return 1;
  double lerr = 0.0;
  for (int i = 0; i < lnspec2; ++i) {
    double d = fabs(lsp2[i] - lsp[i]);
    if (d > lerr) lerr = d;
  }
  printf("LAM roundtrip max err: %.3e\n", lerr);
  if (lerr > 1e-9) {
    fprintf(stderr, "FAIL: LAM roundtrip\n");
    return 10;
  }
  free(lsp);
  free(lgp);
  free(lsp2);
  ectrans_tpu_release_lam(lh);

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
