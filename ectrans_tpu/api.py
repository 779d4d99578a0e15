"""High-level API: SpectralTransform handle + inquiry + utility transforms.

The object-oriented face of the framework, covering the reference's public
API surface (SURVEY.md §2.1):

  SETUP_TRANS0/SETUP_TRANS  -> SpectralTransform(grid, nsmax, mesh=...)
  INV_TRANS / DIR_TRANS     -> .inv_trans() / .dir_trans()
  INV_TRANSAD / DIR_TRANSAD -> .inv_trans_adj() / .dir_trans_adj()
  TRANS_INQ                 -> .inquire()
  SPECNORM / GPNORM_TRANS   -> .specnorm() / .gpnorm()
  VORDIV_TO_UV              -> .vordiv_to_uv()  (also module-level)
  TRANS_PNM                 -> .legendre_polynomials(m)
  DIST_GRID/GATH_GRID/...   -> .dist_grid()/.gath_grid()/.dist_spec()/.gath_spec()
  TRANS_END / TRANS_RELEASE -> .release() (drops cached jits/tables)
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from . import adjoint, norms, transform
from .ops import layout, spectral
from .resolution import EARTH_RADIUS, Resolution, setup
from .transform import InvFlags


class SpectralTransform:
    """One resolution handle, optionally distributed over a (w, v) mesh."""

    def __init__(
        self,
        grid: str | Any,
        nsmax: int | None = None,
        *,
        mesh=None,
        radius: float = EARTH_RADIUS,
        stretch: float = 1.0,
        dtype=jnp.float32,
        precision: str = "highest",
    ):
        """precision: Legendre-contraction tier — "highest" (full fp32
        mantissa), "high" (3-pass bf16 split, inside the reference's
        100*eps benchmark gate), or "bf16" (single-pass; the measured
        low-precision mode, reference FLT gate precedent 1e6*eps)."""
        self.res: Resolution = setup(grid, nsmax, radius, stretch)
        self.dtype = jnp.dtype(dtype)
        self.precision = precision
        self.mesh = mesh
        self._sharded = None
        if mesh is not None:
            from .parallel import ShardedTransform

            self._sharded = ShardedTransform(self.res, mesh, dtype=self.dtype,
                                             precision=self.precision)

    # -- transforms -----------------------------------------------------
    def inv_trans(self, spvor=None, spdiv=None, spscalar=None,
                  flags: InvFlags = InvFlags(), npromatr=None,
                  kvsetuv=None, kvsetsc=None, fspgl_proc=None, **kw):
        flags = InvFlags(**kw) if kw else flags
        if self._sharded is not None:
            return self._sharded.inv_trans(spvor, spdiv, spscalar, flags=flags,
                                           npromatr=npromatr, kvsetuv=kvsetuv,
                                           kvsetsc=kvsetsc,
                                           fspgl_proc=fspgl_proc)
        if kvsetuv is not None or kvsetsc is not None:
            raise ValueError("kvsetuv/kvsetsc require a mesh-attached "
                             "SpectralTransform (distributed field ownership)")
        return transform.inv_trans(
            self.res, spvor, spdiv, spscalar, flags=flags, dtype=self.dtype,
            npromatr=npromatr, fspgl_proc=fspgl_proc,
            precision=self.precision,
        )

    def dir_trans(self, u=None, v=None, scalars=None, npromatr=None,
                  kvsetuv=None, kvsetsc=None):
        if self._sharded is not None:
            return self._sharded.dir_trans(u, v, scalars, kvsetuv=kvsetuv,
                                           kvsetsc=kvsetsc, npromatr=npromatr)
        if kvsetuv is not None or kvsetsc is not None:
            raise ValueError("kvsetuv/kvsetsc require a mesh-attached "
                             "SpectralTransform (distributed field ownership)")
        return transform.dir_trans(self.res, u, v, scalars, dtype=self.dtype,
                                   npromatr=npromatr, precision=self.precision)

    # -- callmode-2 (split-array) adapters --------------------------------
    # The reference supports two calling conventions (dir_trans.F90:69-92,
    # ectrans-benchmark.F90:1175-1179): callmode 1 = combined PGP/PSPSCALAR
    # arrays (the native surface here), callmode 2 = split families
    # PGPUV/PGP3A/PGP3B/PGP2 <-> PSPSC3A/PSPSC3B/PSPSC2.  The composite
    # scalar ordering is pinned by ltinv_mod.F90:173-196: SC2 fields first,
    # then SC3A variable-major (levels contiguous per variable), then SC3B.

    def inv_trans_split(self, spvor=None, spdiv=None, spsc3a=None,
                        spsc3b=None, spsc2=None,
                        flags: InvFlags = InvFlags(), **kw):
        """Split-array inverse transform (callmode 2).

        spvor/spdiv: (nlev_uv, nspec2); spsc3a/spsc3b: (nfld, nlev, nspec2);
        spsc2: (nfld2, nspec2).  Returns a dict with grid families
        ``u, v`` (nlev_uv, ndgl, ndlon), ``sc2`` (nfld2, ndgl, ndlon),
        ``sc3a/sc3b`` (nfld, nlev, ndgl, ndlon) and, per flags, ``vor, div,
        nsd2/nsd3a/nsd3b, ewu, ewv, ewsc2/ewsc3a/ewsc3b``.
        """
        parts, splits = [], []
        for name, arr in (("sc2", spsc2), ("sc3a", spsc3a), ("sc3b", spsc3b)):
            if arr is None:
                continue
            flat = jnp.reshape(jnp.asarray(arr), (-1, self.res.nspec2))
            parts.append(flat)
            splits.append((name, arr.shape, flat.shape[0]))
        spscalar = jnp.concatenate(parts, axis=0) if parts else None
        grid = self.inv_trans(spvor, spdiv, spscalar, flags=flags, **kw)
        nuv = 0 if spvor is None else spvor.shape[0]
        nsc = 0 if spscalar is None else spscalar.shape[0]
        out = {}
        off = 0

        def take(n):
            nonlocal off
            blk = grid[off : off + n]
            off += n
            return blk

        def split_sc(blk, suffix=""):
            o = 0
            for name, shape, n in splits:
                fam = blk[o : o + n]
                o += n
                out[suffix + name] = (
                    fam if len(shape) == 2
                    else jnp.reshape(fam, shape[:2] + fam.shape[1:]))

        if nuv:
            if flags.vorgp:
                out["vor"] = take(nuv)
            if flags.divgp:
                out["div"] = take(nuv)
            out["u"] = take(nuv)
            out["v"] = take(nuv)
        if nsc:
            split_sc(take(nsc))
            if flags.scders:
                split_sc(take(nsc), "nsd")
        if nuv and flags.uvders:
            out["ewu"] = take(nuv)
            out["ewv"] = take(nuv)
        if nsc and flags.scders:
            split_sc(take(nsc), "ew")
        return out

    def dir_trans_split(self, u=None, v=None, gp3a=None, gp3b=None,
                        gp2=None, **kw):
        """Split-array direct transform (callmode 2).

        u/v: (nlev_uv, ndgl, ndlon); gp3a/gp3b: (nfld, nlev, ndgl, ndlon);
        gp2: (nfld2, ndgl, ndlon).  Returns (spvor, spdiv, dict with
        ``sc2`` (nfld2, nspec2) / ``sc3a``/``sc3b`` (nfld, nlev, nspec2)).
        """
        parts, splits = [], []
        for name, arr in (("sc2", gp2), ("sc3a", gp3a), ("sc3b", gp3b)):
            if arr is None:
                continue
            flat = jnp.reshape(
                jnp.asarray(arr),
                (-1,) + tuple(arr.shape[-2:]))
            parts.append(flat)
            splits.append((name, arr.shape, flat.shape[0]))
        scalars = jnp.concatenate(parts, axis=0) if parts else None
        spvor, spdiv, spsc = self.dir_trans(u, v, scalars, **kw)
        out = {}
        o = 0
        for name, shape, n in splits:
            fam = spsc[o : o + n]
            o += n
            out[name] = (fam if len(shape) == 3
                         else jnp.reshape(fam, shape[:2] + fam.shape[1:]))
        return spvor, spdiv, out

    def inv_trans_adj(self, grid_ad, nfld_uv=0, nfld_sc=0,
                      flags: InvFlags = InvFlags()):
        return adjoint.inv_trans_adj(
            self.res, grid_ad, nfld_uv, nfld_sc, flags=flags, dtype=self.dtype
        )

    def dir_trans_adj(self, spvor_ad=None, spdiv_ad=None, spscalar_ad=None,
                      nfld_uv=0, nfld_sc=0):
        return adjoint.dir_trans_adj(
            self.res, spvor_ad, spdiv_ad, spscalar_ad,
            nfld_uv=nfld_uv, nfld_sc=nfld_sc, dtype=self.dtype,
        )

    def inv_trans_latlon(self, ll, spvor=None, spdiv=None, spscalar=None,
                         flags: InvFlags = InvFlags()):
        """Inverse transform onto a regular lat-lon grid (LDLL mode,
        exact spectral evaluation — see ``ectrans_tpu.latlon``)."""
        from .latlon import inv_trans_latlon

        return inv_trans_latlon(self.res, ll, spvor, spdiv, spscalar,
                                flags=flags, dtype=self.dtype)

    def dir_trans_latlon(self, ll, u=None, v=None, scalars=None):
        """Direct transform from a regular lat-lon grid (direct LDLL mode;
        interpolation-limited — see ``ectrans_tpu.latlon``)."""
        from .latlon import dir_trans_latlon

        return dir_trans_latlon(self.res, ll, u, v, scalars, dtype=self.dtype)

    # -- norms / utilities ----------------------------------------------
    def specnorm(self, spec, met=None):
        return norms.specnorm(self.res, spec, met)

    def gpnorm(self, grid, ave_only=False):
        return norms.gpnorm(self.res, grid, ave_only)

    def vordiv_to_uv(self, spvor, spdiv):
        return vordiv_to_uv(self.res, spvor, spdiv, dtype=self.dtype)

    def legendre_polynomials(self, m: int) -> np.ndarray:
        """P̄_n^m at all Gaussian latitudes for one m (TRANS_PNM,
        ``trans_pnm.F90``): shape (nsmax+2-m?, ndgl) -> (n index, lat)."""
        res = self.res
        tab = np.zeros((res.NP - m, res.ndgl))
        nh = res.grid.ndgnh
        for k, n in enumerate(range(m, res.NP)):
            col = _pnm_value(res, m, n)
            tab[k, :nh] = col
            tab[k, nh:] = col[::-1] * ((-1) ** ((n + m) % 2))
        return tab

    # -- distribution helpers (DIST_GRID/GATH_GRID/DIST_SPEC/GATH_SPEC) --
    def dist_grid(self, grid_global):
        """Place a global grid array with the distributed layout (owner view).

        On a mesh: NamedSharding P(None, ("w","v"), None); without a mesh the
        identity.  The reference's DIST_GRID scatters from one owner PE —
        with jax.device_put XLA performs the scatter.
        """
        if self.mesh is None:
            return jnp.asarray(grid_global)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            grid_global, NamedSharding(self.mesh, P(None, ("w", "v"), None))
        )

    def gath_grid(self, grid):
        """Gather a (possibly sharded) grid array to a host numpy array."""
        return np.asarray(jax.device_get(grid))

    def dist_spec(self, spec_global):
        if self.mesh is None:
            return jnp.asarray(spec_global)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(spec_global, NamedSharding(self.mesh, P("v", None)))

    def gath_spec(self, spec):
        return np.asarray(jax.device_get(spec))

    # -- inquiry ----------------------------------------------------------
    def inquire(self) -> dict:
        """TRANS_INQ equivalent: every size/address/geometry array a caller
        needs (reference ``trans_inq.F90:11-529``)."""
        res = self.res
        g = res.grid
        mu, w = g.gauss()
        return {
            "nsmax": res.nsmax,
            "nspec": g.nspec,
            "nspec2": g.nspec2,
            "nspec2g": g.nspec2,
            "ndgl": g.ndgl,
            "ndlon": g.ndlon,
            "ngptot": g.ngptot,
            "ngptotg": g.ngptot,
            "nloen": np.asarray(g.nloen),
            "nmen": res.nmen.copy(),
            "ndglu": res.ndglu.copy(),
            "nasm0": res.nasm0.copy(),
            "rmu": res.mu.copy(),   # stretched latitudes when stretch != 1
            "rgw": w,
            "rlapin": res.rlapin.copy(),
            "latitudes_deg": g.latitudes_deg(),
            "nump": res.M,
            "myms": np.arange(res.M),
            **self._inquire_distributed(),
        }

    def _inquire_distributed(self) -> dict:
        """Distributed-layout keys of TRANS_INQ (``trans_inq.F90``: NPRTRW/
        NPRTRV echo, per-w-set NUMPP/MYMS/NSPEC2, NGPTOTMX) when a mesh is
        attached; empty otherwise."""
        if self._sharded is None:
            return {}
        st = self._sharded
        d = st.dist
        res = self.res
        ML = d.ML
        myms = []
        numpp = []
        nspec2_w = []
        for s in range(d.w):
            ms = sorted(int(m) for m in d.perm[s * ML : (s + 1) * ML]
                        if m < res.M)
            myms.append(np.asarray(ms))
            numpp.append(len(ms))
            nspec2_w.append(int(sum(2 * (res.nsmax - m + 1) for m in ms)))
        # grid space is decomposed over w*v shards (ndgl_pad/(w*v) latitude
        # rows each) — NGPTOTMX is the max gridpoint count over THOSE blocks
        LLg = d.ndgl_pad // (d.w * d.v)
        nfrstlat, nlstlat, ngptotl = [], [], []
        for i0 in range(0, d.ndgl_pad, LLg):
            i1 = min(i0 + LLg, res.ndgl)
            nfrstlat.append(min(i0, res.ndgl))
            nlstlat.append(max(i1 - 1, min(i0, res.ndgl)))
            ngptotl.append(sum(res.grid.nloen[l] for l in range(min(i0, res.ndgl), i1)))
        # latitude -> owning shard maps (reference NPROCL, trans_inq.F90):
        # Fourier space owns whole-w-set blocks of LL rows; grid space owns
        # (w, v)-flattened blocks of LLg rows
        LL = d.LL
        nprocl_fs = np.minimum(np.arange(res.ndgl) // LL, d.w - 1)
        nprocl_grid = np.minimum(np.arange(res.ndgl) // LLg, d.w * d.v - 1)
        return {
            "nprtrw": d.w,
            "nprtrv": d.v,
            "numpp": np.asarray(numpp),
            "myms_w": tuple(myms),
            "nspec2_w": np.asarray(nspec2_w),
            "ngptotmx": max(ngptotl),
            # Fourier-space latitude ownership (NULTPP/NPTRLS/NPROCL):
            # w-set s owns the LL contiguous (padded) rows starting at s*LL
            "nultpp": np.asarray([LL] * d.w),
            "nptrls": np.arange(0, d.ndgl_pad, LL),
            "nprocl": nprocl_fs,
            # grid-space latitude ownership over the w*v shard axis
            # (NFRSTLAT/NLSTLAT/NGPTOTL analogues; 0-based rows)
            "nfrstlat": np.asarray(nfrstlat),
            "nlstlat": np.asarray(nlstlat),
            "ngptotl": np.asarray(ngptotl),
            "nprocl_grid": nprocl_grid,
        }

    def release(self):
        """Drop cached jitted executables (TRANS_RELEASE equivalent)."""
        self._sharded = None
        if self.mesh is not None:
            from .parallel import ShardedTransform

            self._sharded = ShardedTransform(self.res, self.mesh, dtype=self.dtype,
                                             precision=self.precision)


def _pnm_value(res: Resolution, m: int, n: int) -> np.ndarray:
    """P̄_n^m at NH latitudes from the parity-split tables."""
    k = (n - m) // 2
    if (n - m) % 2 == 0:
        return np.asarray(res.psym[m, :, k])
    return np.asarray(res.pasym[m, :, k])


def vordiv_to_uv(res: Resolution, spvor, spdiv, dtype=jnp.float32):
    """Standalone spectral vor/div -> spectral U = a*u*cos(theta)-type winds
    (reference VORDIV_TO_UV, ``vordiv_to_uv.F90``): packed in, packed out.

    Note the returned packed arrays truncate the n = nsmax+1 row (packed
    layout holds n <= nsmax), matching the reference's KSMAX-truncated
    output.
    """
    from .transform import _coeff_tables

    dtype = jnp.dtype(dtype)
    tables = res.device_tables(dtype)
    ct = _coeff_tables(res, str(dtype))
    dvor = layout.packed_to_dense(spvor.astype(dtype), tables)
    ddiv = layout.packed_to_dense(spdiv.astype(dtype), tables)
    du, dv = spectral.vordiv_to_uv(dvor, ddiv, ct["vd"])
    return layout.dense_to_packed(du, tables), layout.dense_to_packed(dv, tables)
