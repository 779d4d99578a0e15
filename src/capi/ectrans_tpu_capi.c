/*
 * ectrans_tpu C API implementation: embeds CPython and forwards to
 * ectrans_tpu.capi_bridge (the transi-equivalent native layer; the
 * reference's transi is C over Fortran, src/transi/transi.c — here it is
 * C over the embedded Python/JAX engine).
 *
 * Raw pointers are passed to the bridge as (address, length) integers;
 * the bridge wraps them zero-copy with numpy.ctypeslib and launches the
 * jitted TPU pipelines.
 *
 * Build:  cc -shared -fPIC ectrans_tpu_capi.c $(python3-config --includes \
 *         --embed --libs) -o libectrans_tpu.so
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include "ectrans_tpu.h"

static PyObject *g_bridge = NULL;
static int g_we_initialized = 0;

static int ensure_init(void) {
  if (g_bridge != NULL) return ECTRANS_TPU_SUCCESS;
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_we_initialized = 1;
  }
  g_bridge = PyImport_ImportModule("ectrans_tpu.capi_bridge");
  if (g_bridge == NULL) {
    PyErr_Print();
    return ECTRANS_TPU_ERR_INIT;
  }
  return ECTRANS_TPU_SUCCESS;
}

/* call bridge.<name>(args...) and return a new reference or NULL */
static PyObject *bridge_call(const char *name, PyObject *args) {
  PyObject *fn = PyObject_GetAttrString(g_bridge, name);
  if (fn == NULL) return NULL;
  PyObject *out = PyObject_CallObject(fn, args);
  Py_DECREF(fn);
  return out;
}

int ectrans_tpu_init(void) { return ensure_init(); }

int ectrans_tpu_setup(const char *grid, int nsmax) {
  if (ensure_init() != 0) return ECTRANS_TPU_ERR_INIT;
  PyObject *args = Py_BuildValue("(si)", grid, nsmax);
  PyObject *out = bridge_call("setup", args);
  Py_DECREF(args);
  if (out == NULL) {
    PyErr_Print();
    return ECTRANS_TPU_ERR_SETUP;
  }
  long h = PyLong_AsLong(out);
  Py_DECREF(out);
  return (int)h;
}

int ectrans_tpu_inquire(int handle, int *nspec2, int *ngptot, int *ndgl,
                        int *ndlon, int *nsmax) {
  if (ensure_init() != 0) return ECTRANS_TPU_ERR_INIT;
  PyObject *args = Py_BuildValue("(i)", handle);
  PyObject *out = bridge_call("inquire", args);
  Py_DECREF(args);
  if (out == NULL) {
    PyErr_Print();
    return ECTRANS_TPU_ERR_HANDLE;
  }
  long a, b, c, d, e;
  if (!PyArg_ParseTuple(out, "lllll", &a, &b, &c, &d, &e)) {
    Py_DECREF(out);
    return ECTRANS_TPU_ERR_HANDLE;
  }
  Py_DECREF(out);
  if (nspec2) *nspec2 = (int)a;
  if (ngptot) *ngptot = (int)b;
  if (ndgl) *ndgl = (int)c;
  if (ndlon) *ndlon = (int)d;
  if (nsmax) *nsmax = (int)e;
  return ECTRANS_TPU_SUCCESS;
}

int ectrans_tpu_nloen(int handle, int *nloen) {
  if (ensure_init() != 0) return ECTRANS_TPU_ERR_INIT;
  PyObject *args =
      Py_BuildValue("(iK)", handle, (unsigned long long)(uintptr_t)nloen);
  PyObject *out = bridge_call("fill_nloen", args);
  Py_DECREF(args);
  if (out == NULL) {
    PyErr_Print();
    return ECTRANS_TPU_ERR_HANDLE;
  }
  Py_DECREF(out);
  return ECTRANS_TPU_SUCCESS;
}

static int run2(const char *fn, int handle, int nfld, const double *in1,
                double *out1) {
  if (ensure_init() != 0) return ECTRANS_TPU_ERR_INIT;
  PyObject *args = Py_BuildValue(
      "(iiKK)", handle, nfld, (unsigned long long)(uintptr_t)in1,
      (unsigned long long)(uintptr_t)out1);
  PyObject *out = bridge_call(fn, args);
  Py_DECREF(args);
  if (out == NULL) {
    PyErr_Print();
    return ECTRANS_TPU_ERR_TRANS;
  }
  Py_DECREF(out);
  return ECTRANS_TPU_SUCCESS;
}

static int run4(const char *fn, int handle, int nfld, const double *in1,
                const double *in2, double *out1, double *out2) {
  if (ensure_init() != 0) return ECTRANS_TPU_ERR_INIT;
  PyObject *args = Py_BuildValue(
      "(iiKKKK)", handle, nfld, (unsigned long long)(uintptr_t)in1,
      (unsigned long long)(uintptr_t)in2, (unsigned long long)(uintptr_t)out1,
      (unsigned long long)(uintptr_t)out2);
  PyObject *out = bridge_call(fn, args);
  Py_DECREF(args);
  if (out == NULL) {
    PyErr_Print();
    return ECTRANS_TPU_ERR_TRANS;
  }
  Py_DECREF(out);
  return ECTRANS_TPU_SUCCESS;
}

int ectrans_tpu_invtrans(int handle, int nfld, const double *spec,
                         double *gp) {
  return run2("invtrans_scalar", handle, nfld, spec, gp);
}

int ectrans_tpu_dirtrans(int handle, int nfld, const double *gp,
                         double *spec) {
  return run2("dirtrans_scalar", handle, nfld, gp, spec);
}

int ectrans_tpu_invtrans_vordiv(int handle, int nfld, const double *spvor,
                                const double *spdiv, double *u, double *v) {
  return run4("invtrans_vordiv", handle, nfld, spvor, spdiv, u, v);
}

int ectrans_tpu_dirtrans_vordiv(int handle, int nfld, const double *u,
                                const double *v, double *spvor,
                                double *spdiv) {
  return run4("dirtrans_vordiv", handle, nfld, u, v, spvor, spdiv);
}

int ectrans_tpu_invtrans_adj(int handle, int nfld, const double *gp_ad,
                             double *spec_ad) {
  return run2("invtrans_adj_scalar", handle, nfld, gp_ad, spec_ad);
}

int ectrans_tpu_dirtrans_adj(int handle, int nfld, const double *spec_ad,
                             double *gp_ad) {
  return run2("dirtrans_adj_scalar", handle, nfld, spec_ad, gp_ad);
}

int ectrans_tpu_specnorm(int handle, int nfld, const double *spec,
                         double *norms) {
  return run2("specnorm", handle, nfld, spec, norms);
}

int ectrans_tpu_release(int handle) {
  if (ensure_init() != 0) return ECTRANS_TPU_ERR_INIT;
  PyObject *args = Py_BuildValue("(i)", handle);
  PyObject *out = bridge_call("release", args);
  Py_DECREF(args);
  if (out == NULL) {
    PyErr_Print();
    return ECTRANS_TPU_ERR_HANDLE;
  }
  Py_DECREF(out);
  return ECTRANS_TPU_SUCCESS;
}

int ectrans_tpu_finalize(void) {
  Py_XDECREF(g_bridge);
  g_bridge = NULL;
  if (g_we_initialized && Py_IsInitialized()) {
    Py_Finalize();
    g_we_initialized = 0;
  }
  return ECTRANS_TPU_SUCCESS;
}
