"""LAM spectral and grid-point norms (ESPECNORM / EGPNORM_TRANS).

* ``especnorm``: per-field sqrt of the metric-weighted sum of squares of all
  four components per elliptic (m, n) pair — exactly the reference ESPNORMD
  accumulation (``espnormd_mod.F90:40-55``: met(m,n) * (c0^2+c1^2+c2^2+c3^2)).
* ``egpnorm``: per-field (average, min, max).  ``full_domain=True``
  (default) covers the whole extended domain — the reference
  EGPNORM_TRANS statistics run over NGPTOT, i.e. including the extension
  zone; ``full_domain=False`` restricts to the C+I zone (the physically
  meaningful subdomain), which is often what a diagnostic actually wants.
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


def egpnorm(res: LamResolution, grid, ave_only: bool = False,
            full_domain: bool = True):
    """grid: (nfld, ny, nx) -> per-field (ave, min, max).

    full_domain=True matches the reference EGPNORM_TRANS (statistics over
    the whole extended domain, NGPTOT); full_domain=False restricts to
    the C+I zone."""
    g = res.grid
    ci = grid if full_domain else grid[:, : g.nyux, : g.nxux]
    ave = jnp.mean(ci, axis=(1, 2))
    if ave_only:
        return ave, None, None
    return ave, jnp.min(ci, axis=(1, 2)), jnp.max(ci, axis=(1, 2))
