"""Attribute the TCO-scale roundtrip error to its source (VERDICT r3 #3).

Round 4 found BENCH roundtrip_err at TCO1279 is bit-identical before and
after the tablegen double-single seed fix — so the error driver must be
located by measurement, not docstring.  This script runs the bench's
exact error check at one config under each variant:

  device/dense   — production path (device-materialized tables, dense
                   Pallas bf16x6 kernels)
  host/dense     — exact host fp64->fp32 tables, same kernels
  device/xla     — device tables, XLA HIGHEST einsum engine
  host/xla       — round-2 configuration (err 2.1e-6 at TCO1279 then)

Whichever axis moves the error is the driver.  Run on the chip:
    python tools/err_attrib.py [TCO639|TCO1279]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NFLD_SC, NFLD_UV = 6, 2


def roundtrip_err(res, variant):
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.transform import InvFlags

    src, eng = variant
    tier = os.environ.get("ECTRANS_ERR_TIER", "highest")
    os.environ["ECTRANS_TPU_TABLE_SOURCE"] = src
    os.environ["ECTRANS_TPU_LEG_KERNEL"] = eng
    res.full_legendre.cache_clear()
    res.grouped_legendre.cache_clear()

    rng = np.random.default_rng(0)  # bench seed: identical inputs

    def packed(n):
        x = rng.standard_normal((n, res.nspec2)).astype(np.float32)
        x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
        x[:, 0] = 0.0
        return jnp.asarray(x)

    spvor, spdiv, spsc = packed(NFLD_UV), packed(NFLD_UV), packed(NFLD_SC)
    flags = InvFlags(scders=True, uvders=True)
    t0 = time.time()
    grid = et.inv_trans(res, spvor=spvor, spdiv=spdiv, spscalar=spsc,
                        flags=flags, precision=tier)
    u = grid[0:NFLD_UV]
    v = grid[NFLD_UV : 2 * NFLD_UV]
    sc = grid[2 * NFLD_UV : 2 * NFLD_UV + NFLD_SC]
    out = et.dir_trans(res, u=u, v=v, scalars=sc, precision=tier)
    worst = {}
    for name, got, ref in zip(("vor", "div", "sc"), out,
                              (spvor, spdiv, spsc)):
        d = np.abs(np.asarray(got) - np.asarray(ref))
        if name != "sc":
            d[:, :2] = 0.0
        worst[name] = float(d.max())
    print(f"{src}/{eng}/{tier}: {worst}  ({time.time()-t0:.0f}s)", flush=True)
    return worst


def main():
    import ectrans_tpu as et

    config = sys.argv[1] if len(sys.argv) > 1 else "TCO639"
    res = et.setup(config)
    print(f"{config}: T{res.nsmax} ndgl {res.ndgl}", flush=True)
    for variant in (("device", "dense"), ("host", "dense"),
                    ("device", "xla"), ("host", "xla")):
        try:
            roundtrip_err(res, variant)
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
