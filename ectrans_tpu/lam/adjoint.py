"""LAM adjoint transforms (EINV_TRANSAD / EDIR_TRANSAD equivalents).

As with the global transforms (``ectrans_tpu.adjoint``), the LAM transforms
are linear in their field arguments, so the exact adjoints (the reference's
hand-written ``eltinvad_mod.F90``/``eltdirad_mod.F90`` family) fall out of
``jax.linear_transpose`` and satisfy <F x, y> = <x, F^T y> to rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resolution import LamResolution
from .transform import LamInvFlags, dir_trans_lam, inv_trans_lam


def inv_trans_lam_adj(
    res: LamResolution,
    grid_ad,
    nfld_uv: int = 0,
    nfld_sc: int = 0,
    *,
    flags: LamInvFlags = LamInvFlags(),
    dtype=jnp.float32,
):
    """Adjoint of inv_trans_lam: grid cotangent -> spectral cotangents.

    Returns (spvor_ad, spdiv_ad, spscalar_ad, meanu_ad, meanv_ad).
    """
    dtype = jnp.dtype(dtype)
    shapes = []
    if nfld_uv:
        shapes += [jax.ShapeDtypeStruct((nfld_uv, res.nspec2), dtype)] * 2
        shapes += [jax.ShapeDtypeStruct((nfld_uv,), dtype)] * 2
    if nfld_sc:
        shapes += [jax.ShapeDtypeStruct((nfld_sc, res.nspec2), dtype)]

    def fwd(*args):
        i = 0
        spvor = spdiv = meanu = meanv = spsc = None
        if nfld_uv:
            spvor, spdiv, meanu, meanv = args[:4]
            i = 4
        if nfld_sc:
            spsc = args[i]
        return inv_trans_lam(res, spvor, spdiv, spsc, meanu, meanv,
                             flags=flags, dtype=dtype)

    outs = jax.linear_transpose(fwd, *shapes)(grid_ad.astype(dtype))
    spvor_ad = spdiv_ad = meanu_ad = meanv_ad = spsc_ad = None
    i = 0
    if nfld_uv:
        spvor_ad, spdiv_ad, meanu_ad, meanv_ad = outs[:4]
        i = 4
    if nfld_sc:
        spsc_ad = outs[i]
    return spvor_ad, spdiv_ad, spsc_ad, meanu_ad, meanv_ad


def dir_trans_lam_adj(
    res: LamResolution,
    spvor_ad=None,
    spdiv_ad=None,
    spscalar_ad=None,
    meanu_ad=None,
    meanv_ad=None,
    *,
    nfld_uv: int = 0,
    nfld_sc: int = 0,
    dtype=jnp.float32,
):
    """Adjoint of dir_trans_lam: spectral cotangents -> grid cotangents.

    Returns (u_ad, v_ad, scalars_ad)."""
    dtype = jnp.dtype(dtype)
    g = res.grid
    gshape = (g.ny, g.nx)
    shapes = []
    if nfld_uv:
        shapes += [jax.ShapeDtypeStruct((nfld_uv,) + gshape, dtype)] * 2
    if nfld_sc:
        shapes += [jax.ShapeDtypeStruct((nfld_sc,) + gshape, dtype)]

    def fwd(*grids):
        i = 0
        u = v = sc = None
        if nfld_uv:
            u, v = grids[0], grids[1]
            i = 2
        if nfld_sc:
            sc = grids[i]
        out = dir_trans_lam(res, u, v, sc, dtype=dtype)
        return tuple(x for x in out if x is not None)

    if nfld_uv:
        if meanu_ad is None:
            meanu_ad = jnp.zeros((nfld_uv,), dtype)
        if meanv_ad is None:
            meanv_ad = jnp.zeros((nfld_uv,), dtype)
    cot = tuple(
        jnp.asarray(x, dtype)
        for x in (spvor_ad, spdiv_ad, spscalar_ad, meanu_ad, meanv_ad)
        if x is not None
    )
    outs = jax.linear_transpose(fwd, *shapes)(cot)
    u_ad = v_ad = sc_ad = None
    i = 0
    if nfld_uv:
        u_ad, v_ad = outs[0], outs[1]
        i = 2
    if nfld_sc:
        sc_ad = outs[i]
    return u_ad, v_ad, sc_ad
