"""High-level LAM handle: the ESETUP_TRANS / E*-routine face of the
framework (reference ``src/etrans/cpu/external``)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import adjoint, biper, norms, transform
from .geometry import LamGrid, make_lam_grid
from .resolution import LamResolution, setup_lam
from .transform import LamInvFlags


class LamTransform:
    """One LAM resolution handle (ESETUP_TRANS equivalent).

    ``LamTransform(nx, ny, nxux=..., nyux=..., msmax=..., nsmax=...,
    dx=..., dy=...)`` or ``LamTransform(grid=LamGrid(...))``.
    """

    def __init__(self, nx: int | None = None, ny: int | None = None,
                 *, grid: LamGrid | None = None, mesh=None,
                 dtype=jnp.float32, **kw):
        if grid is None:
            grid = make_lam_grid(nx, ny, **kw)
        self.grid = grid
        self.res: LamResolution = setup_lam(grid)
        self.dtype = jnp.dtype(dtype)
        self._sharded = None
        if mesh is not None:
            from .sharded import ShardedLamTransform

            self._sharded = ShardedLamTransform(self.res, mesh, dtype=self.dtype)

    # -- transforms -------------------------------------------------------
    def inv_trans(self, spvor=None, spdiv=None, spscalar=None,
                  meanu=None, meanv=None, flags: LamInvFlags = LamInvFlags(),
                  **kw):
        flags = LamInvFlags(**kw) if kw else flags
        if self._sharded is not None:
            return self._sharded.inv_trans(spvor, spdiv, spscalar,
                                           meanu, meanv, flags=flags)
        return transform.inv_trans_lam(
            self.res, spvor, spdiv, spscalar, meanu, meanv,
            flags=flags, dtype=self.dtype,
        )

    def dir_trans(self, u=None, v=None, scalars=None):
        if self._sharded is not None:
            return self._sharded.dir_trans(u, v, scalars)
        return transform.dir_trans_lam(self.res, u, v, scalars,
                                       dtype=self.dtype)

    def inv_trans_adj(self, grid_ad, nfld_uv=0, nfld_sc=0,
                      flags: LamInvFlags = LamInvFlags()):
        return adjoint.inv_trans_lam_adj(self.res, grid_ad, nfld_uv, nfld_sc,
                                         flags=flags, dtype=self.dtype)

    def dir_trans_adj(self, spvor_ad=None, spdiv_ad=None, spscalar_ad=None,
                      meanu_ad=None, meanv_ad=None, *, nfld_uv=0, nfld_sc=0):
        return adjoint.dir_trans_lam_adj(
            self.res, spvor_ad, spdiv_ad, spscalar_ad, meanu_ad, meanv_ad,
            nfld_uv=nfld_uv, nfld_sc=nfld_sc, dtype=self.dtype,
        )

    # -- utilities --------------------------------------------------------
    def biperiodicize(self, field, mode: str = "spline", **kw):
        """Extend C+I data onto the E zone (FPBIPERE equivalent)."""
        return biper.biperiodicize(field, self.grid, mode=mode, **kw)

    def specnorm(self, spec, met=None):
        return norms.especnorm(self.res, spec, met)

    def gpnorm(self, grid, ave_only: bool = False, full_domain: bool = True):
        """Grid-point norms; full_domain=True covers the whole extended
        domain (the reference EGPNORM_TRANS convention), False restricts
        to the C+I zone."""
        return norms.egpnorm(self.res, grid, ave_only, full_domain)

    def dist_grid(self, grid_global):
        """Place a global (nfld, ny, nx) grid with the distributed layout
        (EDIST_GRID equivalent; identity without a mesh)."""
        import jax
        import jax.numpy as _jnp

        if self._sharded is None:
            return _jnp.asarray(grid_global)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            grid_global,
            NamedSharding(self._sharded.mesh, P(None, ("w", "v"), None)),
        )

    def gath_grid(self, grid):
        """Gather a (possibly sharded) grid to host (EGATH_GRID)."""
        import jax

        return np.asarray(jax.device_get(grid))

    def inquire(self) -> dict:
        """ETRANS_INQ equivalent."""
        g = self.grid
        return {
            "nx": g.nx, "ny": g.ny, "nxux": g.nxux, "nyux": g.nyux,
            "msmax": g.msmax, "nsmax": g.nsmax,
            "exwn": g.exwn, "eywn": g.eywn,
            "ngptot": g.ngptot, "nspec2": g.nspec2,
            "kntmp": np.asarray(self.res.kntmp),
            "nesm0": np.asarray(self.res.nesm0),
        }
