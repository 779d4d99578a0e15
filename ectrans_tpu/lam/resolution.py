"""Per-resolution LAM state: packed<->dense spectral maps and coefficient
tables (the etrans analogue of ``resolution.py``; reference TPMALD_* modules
``tpmald_dim.F90``/``tpmald_distr.F90``/``tpmald_geo.F90``).

Spectral layouts
----------------
* **packed** (user-facing, etrans-compatible): real array ``(nfld, nspec2)``
  m-major, n ascending within m up to the elliptic limit kntmp(m), 4 reals
  per (m, n): (mer-re of zon-re, mer-im of zon-re, mer-re of zon-im,
  mer-im of zon-im) — the NESM0 addressing of ``eprfi1b_mod.F90:85-118``.
* **dense** (internal): ``(nfld, 4, M, N)`` with M = msmax+1, N = nsmax+1,
  zero outside the ellipse.  Component order matches packed.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .geometry import LamGrid


@dataclasses.dataclass(frozen=True, eq=False)
class LamResolution:
    grid: LamGrid

    kntmp: np.ndarray        # (M,) elliptic meridional limit per m
    nesm0: np.ndarray        # (M,) packed offset of (m, n=0)
    valid: np.ndarray        # (M, N) 1.0 inside ellipse
    # packed -> dense gather: index into packed (+1 zero slot)
    dense_gather: np.ndarray     # (4, M, N)
    # dense -> packed gather
    packed_c: np.ndarray     # (nspec2,) component 0..3
    packed_m: np.ndarray     # (nspec2,)
    packed_n: np.ndarray     # (nspec2,)

    @property
    def M(self) -> int:
        return self.grid.msmax + 1

    @property
    def N(self) -> int:
        return self.grid.nsmax + 1

    @property
    def nspec2(self) -> int:
        return self.grid.nspec2

    @functools.lru_cache(maxsize=4)
    def device_tables(self, dtype_str: str = "float32") -> dict:
        import jax.numpy as jnp

        g = self.grid
        f = lambda x: jnp.asarray(x, dtype=dtype_str)
        i = lambda x: jnp.asarray(x, dtype=jnp.int32)
        m = np.arange(self.M, dtype=np.float64)[:, None]
        n = np.arange(self.N, dtype=np.float64)[None, :]
        kx = m * g.exwn
        ky = n * g.eywn
        lap = -(kx * kx + ky * ky)
        with np.errstate(divide="ignore"):
            rlepinm = np.where(lap != 0.0, 1.0 / np.where(lap == 0, 1.0, lap), 0.0)
        return dict(
            valid=f(self.valid),
            dense_gather=i(self.dense_gather),
            packed_c=i(self.packed_c),
            packed_m=i(self.packed_m),
            packed_n=i(self.packed_n),
            kx=f(np.broadcast_to(kx, (self.M, self.N))),
            ky=f(np.broadcast_to(ky, (self.M, self.N))),
            rlepinm=f(rlepinm),
        )


@functools.lru_cache(maxsize=16)
def setup_lam(grid: LamGrid) -> LamResolution:
    """Build a LamResolution (the ESETUP_TRANS equivalent,
    ``esetup_trans.F90:117-131``)."""
    M = grid.msmax + 1
    N = grid.nsmax + 1
    kntmp = grid.kntmp

    nesm0 = np.zeros(M, dtype=np.int64)
    off = 0
    for m in range(M):
        nesm0[m] = off
        off += 4 * (int(kntmp[m]) + 1)
    nspec2 = off
    assert nspec2 == grid.nspec2

    valid = (np.arange(N)[None, :] <= kntmp[:, None]).astype(np.float64)
    dense_gather = np.full((4, M, N), nspec2, dtype=np.int64)  # nspec2 = zero slot
    pc = np.zeros(nspec2, dtype=np.int64)
    pm = np.zeros(nspec2, dtype=np.int64)
    pn = np.zeros(nspec2, dtype=np.int64)
    for m in range(M):
        for n in range(int(kntmp[m]) + 1):
            base = nesm0[m] + 4 * n
            for c in range(4):
                dense_gather[c, m, n] = base + c
                pc[base + c], pm[base + c], pn[base + c] = c, m, n
    return LamResolution(
        grid=grid, kntmp=kntmp, nesm0=nesm0, valid=valid,
        dense_gather=dense_gather, packed_c=pc, packed_m=pm, packed_n=pn,
    )
