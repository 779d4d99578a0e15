"""LAM spectral and grid-point norms (ESPECNORM / EGPNORM_TRANS).

* ``especnorm``: per-field sqrt of the metric-weighted sum of squares of all
  four components per elliptic (m, n) pair — exactly the reference ESPNORMD
  accumulation (``espnormd_mod.F90:40-55``: met(m,n) * (c0^2+c1^2+c2^2+c3^2)).
* ``egpnorm``: per-field (average, min, max) over the C+I zone of the grid
  (the physically meaningful part of the extended domain).
"""

from __future__ import annotations

import jax.numpy as jnp

from .resolution import LamResolution


def especnorm(res: LamResolution, spec, met=None):
    """spec: (nfld, nspec2); met: per-(m,n) weights (M, N) or None."""
    sq = spec * spec
    if met is not None:
        w = jnp.asarray(met)[res.packed_m, res.packed_n]
        sq = sq * w[None, :].astype(spec.dtype)
    return jnp.sqrt(jnp.sum(sq, axis=1))


def egpnorm(res: LamResolution, grid, ave_only: bool = False):
    """grid: (nfld, ny, nx); statistics over the C+I zone only."""
    g = res.grid
    ci = grid[:, : g.nyux, : g.nxux]
    ave = jnp.mean(ci, axis=(1, 2))
    if ave_only:
        return ave, None, None
    return ave, jnp.min(ci, axis=(1, 2)), jnp.max(ci, axis=(1, 2))
