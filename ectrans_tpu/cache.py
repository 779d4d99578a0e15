"""On-disk cache for the Legendre-polynomial setup product.

TPU-native equivalent of the reference's legpol checkpoint/restore
(``CDIO_LEGPOL='READF'/'WRITEF'/'MEMBUF'``, ``setup_trans.F90:360-384``,
``read_legpol_mod.F90`` / ``write_legpol_mod.F90``): the expensive setup
product (the dense P̄ table) is cached as an ``.npz`` keyed by
(grid name, truncation, ndgl), so repeated setups at large resolutions skip
the O(M·N·nlat) recurrence.

Set ``ECTRANS_TPU_LEGPOL_DIR`` to move the cache; set it to the empty string
to disable on-disk caching entirely.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import numpy as np

from .grids import GridSpec
from .legendre import build_parity_tables


def _cache_dir() -> pathlib.Path | None:
    env = os.environ.get("ECTRANS_TPU_LEGPOL_DIR")
    if env == "":
        return None
    if env:
        return pathlib.Path(env)
    return pathlib.Path.home() / ".cache" / "ectrans_tpu" / "legpol"


def _cache_key(grid: GridSpec, dtype, mu_nh: np.ndarray) -> str:
    h = hashlib.sha1()
    h.update(
        repr((grid.name, grid.nsmax, grid.ndgl, grid.nloen, np.dtype(dtype).name)).encode()
    )
    # latitude set is part of the key (stretched-sphere setups share a grid)
    h.update(np.ascontiguousarray(mu_nh).tobytes())
    return f"legpol_{grid.name}_T{grid.nsmax}_{h.hexdigest()[:12]}.npz"


def load_parity_cached(
    grid: GridSpec, mu_nh: np.ndarray, nmen_nh: np.ndarray, dtype=np.float64
) -> tuple[np.ndarray, np.ndarray, int]:
    """(psym, pasym, kmax) parity tables, from disk cache if available.

    Large resolutions are cached too (the tables are written uncompressed
    for load speed); set ``ECTRANS_TPU_LEGPOL_DIR=""`` to disable.
    """
    d = _cache_dir()
    if d is not None:
        path = d / _cache_key(grid, dtype, mu_nh)
        if path.exists():
            try:
                with np.load(path) as z:
                    return z["psym"], z["pasym"], int(z["kmax"])
            except Exception:
                pass  # corrupt cache: recompute
    psym, pasym, kmax = build_parity_tables(
        grid.nsmax, mu_nh, ntmax_extra=1, nmen_nh=nmen_nh, dtype=dtype
    )
    if d is not None:
        try:
            d.mkdir(parents=True, exist_ok=True)
            # NB: np.savez appends ".npz" when missing — keep it explicit
            tmp = d / (_cache_key(grid, dtype, mu_nh) + f".tmp{os.getpid()}.npz")
            np.savez(tmp, psym=psym, pasym=pasym, kmax=kmax)
            os.replace(tmp, d / _cache_key(grid, dtype, mu_nh))
        except Exception:
            pass  # cache write failure is non-fatal
    return psym, pasym, kmax


def clear_cache() -> None:
    d = _cache_dir()
    if d is not None and d.exists():
        for p in d.glob("legpol_*.npz"):
            p.unlink(missing_ok=True)
