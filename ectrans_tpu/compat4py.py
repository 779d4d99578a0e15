"""ectrans4py-compatible convenience API (single-process, NumPy in/out).

Mirrors the function surface of the reference's Python binding
(``src/ectrans4py/__init__.py:77-432``), so epygram-style callers can switch
to this framework without code changes:

  ectrans_version, trans_inq4py, etrans_inq4py, get_legendre_assets,
  sp2gp_gauss4py, gp2sp_gauss4py, sp2gp_lam4py, gp2sp_lam4py,
  sp2gp_fft1d4py

All transforms run in float64 on the default JAX backend.  LREORDER
reproduces the FA-file <-> model coefficient reordering of the reference
shims (``sp2gp_gauss4py.F90:82-107``, ``gp2sp_lam4py.F90:75-121``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from . import __version__, setup
from .grids import GridSpec
from .transform import InvFlags, dir_trans, inv_trans


def ectrans_version() -> str:
    return f"ectrans_tpu {__version__}"


def _gauss_grid(ksizej: int, ktrunc: int, kloen) -> GridSpec:
    nloen = tuple(int(x) for x in np.asarray(kloen)[:ksizej])
    reduced = len(set(nloen)) > 1
    return GridSpec(f"G4PY{ksizej}", int(ktrunc), int(ksizej), nloen, reduced)


def trans_inq4py(KSIZEJ, KTRUNC, KSLOEN, KLOEN, KNUMMAXRESOL=10):
    """(KGPTOT, KSPEC, KNMENG) — reference trans_inq4py
    (``__init__.py:164-190``)."""
    grid = _gauss_grid(KSIZEJ, KTRUNC, KLOEN)
    res = setup(grid)
    knmeng = np.zeros(int(KSLOEN), dtype=np.int64)
    knmeng[: grid.ndgl] = res.nmen
    return int(grid.ngptot), int(grid.nspec), knmeng


def etrans_inq4py(KSIZEI, KSIZEJ, KPHYSICALSIZEI, KPHYSICALSIZEJ,
                  KTRUNCX, KTRUNCY, KNUMMAXRESOL=10,
                  PDELTAX=1.0, PDELTAY=1.0):
    """(KGPTOT, KSPEC) for a LAM resolution (``__init__.py:123-159``)."""
    from .lam import make_lam_grid

    grid = make_lam_grid(int(KSIZEI), int(KSIZEJ),
                         nxux=int(KPHYSICALSIZEI), nyux=int(KPHYSICALSIZEJ),
                         msmax=int(KTRUNCX), nsmax=int(KTRUNCY),
                         dx=float(PDELTAX), dy=float(PDELTAY))
    return int(grid.ngptot), int(grid.nspec2)


def get_legendre_assets(KSIZEJ, KTRUNC, KSLOEN, KSPOLEGL, KLOEN,
                        KNUMMAXRESOL=10):
    """(KNMENG, PGW, PRPNM) — cut-off wavenumbers, Gaussian weights and the
    NH Legendre polynomials (``__init__.py:89-118``).  PRPNM columns are
    m-major with n descending within m (the LT work ordering, NLTN)."""
    grid = _gauss_grid(KSIZEJ, KTRUNC, KLOEN)
    res = setup(grid)
    knmeng = np.zeros(int(KSLOEN), dtype=np.int64)
    knmeng[: grid.ndgl] = res.nmen
    mu, w = grid.gauss()
    pgw = np.zeros(int(KSLOEN))
    pgw[: grid.ndgl] = w
    nh = grid.ndgnh
    prpnm = np.zeros((int(KSLOEN) // 2, int(KSPOLEGL)))
    col = 0
    for m in range(grid.nsmax + 1):
        for n in range(grid.nsmax + 1, m - 1, -1):  # n descending (NLTN)
            if col >= int(KSPOLEGL):
                break
            k = (n - m) // 2
            tab = res.psym if (n - m) % 2 == 0 else res.pasym
            prpnm[:nh, col] = tab[m, :, k]
            col += 1
    return knmeng, pgw, prpnm


def _fa_nasm0(ktrunc: int) -> np.ndarray:
    """FA-order block starts (1-based, as in sp2gp_gauss4py.F90:85-90)."""
    nasm0 = np.zeros(ktrunc + 1, dtype=np.int64)
    ji = 1
    for jn in range(ktrunc + 1):
        nasm0[jn] = ji
        ji += 1 + jn + (jn + 1)
    return nasm0


def _reorder_fa_to_model(pspec: np.ndarray, ktrunc: int, nspec2: int) -> np.ndarray:
    """FA file order -> model (NASM0 m-major) order
    (sp2gp_gauss4py.F90:93-107)."""
    nasm0 = _fa_nasm0(ktrunc)
    out = np.zeros(nspec2)
    ji = 0
    for jm in range(ktrunc + 1):
        for jn in range(jm, ktrunc + 1):
            out[ji] = pspec[nasm0[jn] + jm - 1]
            ji += 1
            out[ji] = 0.0 if jm == 0 else pspec[nasm0[jn] - jm - 1]
            ji += 1
    return out


def _reorder_model_to_fa(spec_model: np.ndarray, ktrunc: int, ksize: int) -> np.ndarray:
    """Model order -> FA file order (gp2sp_gauss4py.F90:92-117 inverse)."""
    nasm0 = _fa_nasm0(ktrunc)
    out = np.zeros(ksize)
    ji = 0
    for jm in range(ktrunc + 1):
        for jn in range(jm, ktrunc + 1):
            out[nasm0[jn] + jm - 1] = spec_model[ji]
            ji += 1
            if jm != 0:
                out[nasm0[jn] - jm - 1] = spec_model[ji]
            ji += 1
    return out


def _pack_reduced(field2d: np.ndarray, nloen) -> np.ndarray:
    """(ndgl, ndlon) padded rows -> flat reduced-grid vector (lat-major)."""
    return np.concatenate(
        [field2d[i, : int(nl)] for i, nl in enumerate(nloen)]
    )


def _unpack_reduced(flat: np.ndarray, nloen, ndlon: int) -> np.ndarray:
    out = np.zeros((len(nloen), ndlon))
    off = 0
    for i, nl in enumerate(nloen):
        nl = int(nl)
        out[i, :nl] = flat[off : off + nl]
        off += nl
    return out


def sp2gp_gauss4py(KSIZEJ, KTRUNC, KNUMMAXRESOL, KGPTOT, KSLOEN, KLOEN,
                   KSIZE, LGRADIENT, LREORDER, PSPEC):
    """Spectral -> grid (+ optional N-S/E-W derivatives), global Gaussian
    grid (``__init__.py:305-360``).  Returns (PGPT, PGPTM, PGPTL)."""
    grid = _gauss_grid(KSIZEJ, KTRUNC, KLOEN)
    res = setup(grid)
    spec = np.asarray(PSPEC, dtype=np.float64)
    if LREORDER:
        spec = _reorder_fa_to_model(spec, int(KTRUNC), res.nspec2)
    flags = InvFlags(scders=bool(LGRADIENT))
    out = np.asarray(
        inv_trans(res, spscalar=jnp.asarray(spec[None]), flags=flags,
                  dtype=jnp.float64)
    )
    nloen = grid.nloen
    pgpt = _pack_reduced(out[0], nloen)
    if LGRADIENT:
        pgptm = _pack_reduced(out[1], nloen)  # N-S derivative
        pgptl = _pack_reduced(out[2], nloen)  # E-W derivative
    else:
        pgptm = np.zeros_like(pgpt)
        pgptl = np.zeros_like(pgpt)
    return pgpt, pgptm, pgptl


def gp2sp_gauss4py(KSPEC, KSIZEJ, KTRUNC, KNUMMAXRESOL, KSLOEN, KLOEN,
                   KSIZE, LREORDER, PGPT):
    """Grid -> spectral, global Gaussian grid (``__init__.py:364-410``)."""
    grid = _gauss_grid(KSIZEJ, KTRUNC, KLOEN)
    res = setup(grid)
    field = _unpack_reduced(np.asarray(PGPT, dtype=np.float64),
                            grid.nloen, grid.ndlon)
    _, _, spec = dir_trans(res, scalars=jnp.asarray(field[None]),
                           dtype=jnp.float64)
    spec = np.asarray(spec)[0]
    if LREORDER:
        spec = _reorder_model_to_fa(spec, int(KTRUNC), int(KSPEC))
    return spec[: int(KSPEC)]


# ----------------------------------------------------------------------
# LAM


@functools.lru_cache(maxsize=16)
def _lam_res(nx, ny, nxux, nyux, mx, my, dx, dy):
    from .lam import make_lam_grid, setup_lam

    return setup_lam(make_lam_grid(nx, ny, nxux=nxux, nyux=nyux,
                                   msmax=mx, nsmax=my, dx=dx, dy=dy))


def _lam_fa_spans(res):
    """FA-order block spans per meridional n (gp2sp_lam4py.F90:81-90):
    coefficients grouped by n, 4 reals per (m, n)."""
    kntmp = res.kntmp
    truncy = res.grid.nsmax
    truncx = res.grid.msmax
    spans = []
    ji = 1
    for jn in range(truncy + 1):
        start = (ji - 1) * 4
        nm = int((kntmp >= jn).sum())  # zonal m's whose ellipse reaches jn
        ji += nm
        spans.append((start, (ji - 1) * 4))
    return spans


def _lam_reorder_fa_to_model(pspec, res):
    spans = _lam_fa_spans(res)
    out = np.zeros(res.nspec2)
    # model order: m-major; FA: n-major.  Walk FA blocks (per n, m ascending)
    for jn, (start, end) in enumerate(spans):
        ms = [m for m in range(res.grid.msmax + 1) if res.kntmp[m] >= jn]
        for k, m in enumerate(ms):
            src = start + 4 * k
            dst = int(res.nesm0[m]) + 4 * jn
            out[dst : dst + 4] = pspec[src : src + 4]
    return out


def _lam_reorder_model_to_fa(spec_model, res, ksize):
    spans = _lam_fa_spans(res)
    out = np.zeros(ksize)
    for jn, (start, end) in enumerate(spans):
        ms = [m for m in range(res.grid.msmax + 1) if res.kntmp[m] >= jn]
        for k, m in enumerate(ms):
            dst = start + 4 * k
            src = int(res.nesm0[m]) + 4 * jn
            out[dst : dst + 4] = spec_model[src : src + 4]
    return out


def sp2gp_lam4py(KSIZEI, KSIZEJ, KPHYSICALSIZEI, KPHYSICALSIZEJ,
                 KTRUNCX, KTRUNCY, KNUMMAXRESOL, KSIZE, LGRADIENT,
                 LREORDER, PDELTAX, PDELTAY, PSPEC):
    """LAM spectral -> grid (``__init__.py:195-249``): returns
    (PGPT, PGPTM, PGPTL) flattened over the extended domain."""
    from .lam import LamInvFlags, inv_trans_lam

    res = _lam_res(int(KSIZEI), int(KSIZEJ), int(KPHYSICALSIZEI),
                   int(KPHYSICALSIZEJ), int(KTRUNCX), int(KTRUNCY),
                   float(PDELTAX), float(PDELTAY))
    spec = np.asarray(PSPEC, dtype=np.float64)
    if LREORDER:
        spec = _lam_reorder_fa_to_model(spec, res)
    out = np.asarray(
        inv_trans_lam(res, spscalar=jnp.asarray(spec[None]),
                      flags=LamInvFlags(scders=bool(LGRADIENT)),
                      dtype=jnp.float64)
    )
    pgpt = out[0].ravel()
    if LGRADIENT:
        pgptm = out[1].ravel()
        pgptl = out[2].ravel()
    else:
        pgptm = np.zeros_like(pgpt)
        pgptl = np.zeros_like(pgpt)
    return pgpt, pgptm, pgptl


def gp2sp_lam4py(KSIZE, KSIZEI, KSIZEJ, KPHYSICALSIZEI, KPHYSICALSIZEJ,
                 KTRUNCX, KTRUNCY, KNUMMAXRESOL, PDELTAX, PDELTAY,
                 LREORDER, PGPT):
    """LAM grid -> spectral (``__init__.py:254-300``)."""
    from .lam import dir_trans_lam

    res = _lam_res(int(KSIZEI), int(KSIZEJ), int(KPHYSICALSIZEI),
                   int(KPHYSICALSIZEJ), int(KTRUNCX), int(KTRUNCY),
                   float(PDELTAX), float(PDELTAY))
    field = np.asarray(PGPT, dtype=np.float64).reshape(
        1, int(KSIZEJ), int(KSIZEI)
    )
    _, _, spec, _, _ = dir_trans_lam(res, scalars=jnp.asarray(field),
                                     dtype=jnp.float64)
    spec = np.asarray(spec)[0]
    if LREORDER:
        spec = _lam_reorder_model_to_fa(spec, res, int(KSIZE))
    return spec[: int(KSIZE)]


def sp2gp_fft1d4py(KSIZES, KTRUNC, PSPEC, KSIZEG):
    """1-D spectral -> grid synthesis (vertical-section academic model,
    ``__init__.py:413-432``): half-complex coefficients (re, im pairs up to
    KTRUNC) to KSIZEG points."""
    from .ops.fourier import synthesis_uniform, uniform_dft_tables

    spec = np.asarray(PSPEC, dtype=np.float64)
    re = spec[0 : 2 * (int(KTRUNC) + 1) : 2]
    im = spec[1 : 2 * (int(KTRUNC) + 1) : 2]
    ut = uniform_dft_tables(int(KSIZEG), int(KTRUNC), "float64")
    out = synthesis_uniform(jnp.asarray(re[None]), jnp.asarray(im[None]), ut)
    return np.asarray(out)[0]
