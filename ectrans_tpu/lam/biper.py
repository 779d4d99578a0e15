"""Biperiodicization: extend C+I-zone fields onto the periodic E zone.

Re-implements, vectorized, the reference FPBIPERE chain
(``fpbipere.F90:117-165``): cubic-spline extension (ESPLINE,
``espline_mod.F90``, with alpha = 0 as FPBIPERE passes) followed by
iterative 9-point smoothing of the extension zone (ESMOOTHE,
``esmoothe_mod.F90``), plus an erf-bell Boyd windowing variant (EWINDOWE,
``ewindowe_mod.F90:78-103`` bell function).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .geometry import LamGrid


def _spline_extend_last(f, nux: int, ntot: int):
    """Cubic-spline extension along the last axis (ESPLINE, alpha = 0).

    f: (..., >=nux) with valid data in [0, nux); returns (..., ntot) where
    [nux, ntot) is the spline arc closing the period back to f[..., 0].
    """
    K = float(ntot - nux + 1)
    Kp1 = K + 1.0
    lam = K / Kp1
    fx = f[..., nux - 1]     # f(KDLUX)
    fx1 = f[..., nux - 2]    # f(KDLUX-1)
    f1 = f[..., 0]           # f(KDLUN)
    f2 = f[..., 1]           # f(KDLUN+1)
    eps_a = ((f1 - fx) / K - fx + fx1) * 6.0 / Kp1
    eps_b = (f2 - f1 - (f1 - fx) / K) * 6.0 / Kp1
    mm = 4.0 - lam * lam
    m1 = (2.0 * eps_a - lam * eps_b) / mm
    m2 = (2.0 * eps_b - lam * eps_a) / mm
    a = fx
    b = (f1 - fx) / K - (2.0 * m1 + m2) * K / 6.0
    c = 0.5 * m1
    d = (m2 - m1) / (6.0 * K)
    j = jnp.arange(1, ntot - nux + 1, dtype=f.dtype)
    shape = (1,) * (f.ndim - 1) + (-1,)
    j = j.reshape(shape)
    ext = (a[..., None] + j * (b[..., None] + j * (c[..., None] + j * d[..., None])))
    return jnp.concatenate([f[..., :nux], ext], axis=-1)


def _smooth_pass_x(f, nxux: int, jll: int):
    """One ESMOOTHE x-direction pass: 9-point [1 2 1]^2/16 smoothing of
    longitude columns [nxux+jll-1, nx-jll] (0-based, inclusive) over all
    rows, with periodic wrap neighbours."""
    nfld, ny, nx = f.shape
    up = jnp.roll(f, 1, axis=1)      # lat-1 with wrap
    dn = jnp.roll(f, -1, axis=1)
    lf = jnp.roll(f, 1, axis=2)
    rt = jnp.roll(f, -1, axis=2)
    ul = jnp.roll(up, 1, axis=2)
    ur = jnp.roll(up, -1, axis=2)
    dl = jnp.roll(dn, 1, axis=2)
    dr = jnp.roll(dn, -1, axis=2)
    sm = (4.0 * f + 2.0 * (lf + rt + up + dn) + ul + ur + dl + dr) / 16.0
    cols = jnp.arange(nx)
    # 1-based [KDLUX+JLL, KDLON-JLL+1] -> 0-based [nxux+jll-1, nx-jll]
    m = (cols >= nxux + jll - 1) & (cols <= nx - jll)
    return jnp.where(m[None, None, :], sm, f)


def _smooth_pass_y(f, nyux: int, jll: int):
    nfld, ny, nx = f.shape
    up = jnp.roll(f, 1, axis=1)
    dn = jnp.roll(f, -1, axis=1)
    lf = jnp.roll(f, 1, axis=2)
    rt = jnp.roll(f, -1, axis=2)
    ul = jnp.roll(up, 1, axis=2)
    ur = jnp.roll(up, -1, axis=2)
    dl = jnp.roll(dn, 1, axis=2)
    dr = jnp.roll(dn, -1, axis=2)
    sm = (4.0 * f + 2.0 * (lf + rt + up + dn) + ul + ur + dl + dr) / 16.0
    rows = jnp.arange(ny)
    m = (rows >= nyux + jll - 1) & (rows <= ny - jll)
    return jnp.where(m[None, :, None], sm, f)


def _boyd_bell(width: int, scal: float) -> np.ndarray:
    """Erf bell window of EWINDOWE (``ewindowe_mod.F90:78-90``)."""
    j = np.arange(1, width + 1, dtype=np.float64)
    z = (-width - 1 + 2 * j) / (width + 1)
    with np.errstate(divide="ignore"):
        zl = z / np.sqrt(np.maximum(1e-300, 1.0 - z * z))
    from scipy.special import erf  # scipy available in the image

    return (1.0 + erf(scal * zl)) / 2.0


def biperiodicize(field, grid: LamGrid, mode: str = "spline",
                  boyd_scale: float = 1.0):
    """Extend C+I-zone data onto the full biperiodic domain.

    field: (nfld, nyux, nxux) C+I data (or (nfld, ny, nx) with garbage in
    the E zone, of which only the C+I part is read).
    Returns (nfld, ny, nx).

    mode "spline": cubic-spline extension + 9-point smoothing (the
    FPBIPERE default path).  mode "boyd": erf-bell blend of the two
    periodic continuations across the E zone (the EWINDOWE bell, applied in
    the standard layout rather than the reference's guard-zone buffer).
    mode "zeros": zero-fill (for testing).
    """
    f = jnp.asarray(field)[:, : grid.nyux, : grid.nxux]
    nx, ny, nxux, nyux = grid.nx, grid.ny, grid.nxux, grid.nyux
    if nxux == nx and nyux == ny:
        return f
    if mode == "zeros":
        return jnp.pad(f, [(0, 0), (0, ny - nyux), (0, nx - nxux)])
    if mode == "spline":
        if nxux < nx:
            f = _spline_extend_last(f, nxux, nx)
        if nyux < ny:
            f = _spline_extend_last(f.swapaxes(1, 2), nyux, ny).swapaxes(1, 2)
        # ESMOOTHE: (max extension + 1) // 2 passes in each direction
        npass = (max(nx - nxux, ny - nyux) + 1) // 2
        for jll in range(1, npass + 1):
            if nxux < nx:
                f = _smooth_pass_x(f, nxux, jll)
            if nyux < ny:
                f = _smooth_pass_y(f, nyux, jll)
        return f
    if mode == "boyd":
        if nxux < nx:
            ex = nx - nxux
            bell = jnp.asarray(_boyd_bell(ex, boyd_scale), f.dtype)
            # blend the continuation from the left edge with a linear
            # closure toward the right edge's periodic image
            jj = jnp.arange(1, ex + 1, dtype=f.dtype) / (ex + 1)
            left = f[..., -1:]
            right = f[..., :1]
            lin = left + (right - left) * jj
            wrap = f[..., :ex] if ex <= nxux else jnp.tile(f, (1, 1, -(-ex // nxux)))[..., :ex]
            ext = (1.0 - bell) * lin + bell * wrap
            f = jnp.concatenate([f, ext], axis=-1)
        if nyux < ny:
            ey = ny - nyux
            bell = jnp.asarray(_boyd_bell(ey, boyd_scale), f.dtype)[:, None]
            jj = (jnp.arange(1, ey + 1, dtype=f.dtype) / (ey + 1))[:, None]
            top = f[:, -1:, :]
            bot = f[:, :1, :]
            lin = top + (bot - top) * jj
            wrap = f[:, :ey, :] if ey <= nyux else jnp.tile(f, (1, -(-ey // nyux), 1))[:, :ey, :]
            ext = (1.0 - bell) * lin + bell * wrap
            f = jnp.concatenate([f, ext], axis=1)
        return f
    raise ValueError(f"unknown biperiodicization mode {mode!r}")
