"""T2047 single-chip viability evidence run (VERDICT round-2 item 4).

The reference enables its butterfly FLT above ITHRESHOLD ~ 512
(``suleg_mod.F90``, ``butterfly_alg_mod.F90:30-68``) to bound Legendre
table memory.  This framework's position: on TPU the dense grouped GEMM
is the fast path, and the T2047 memory wall is handled by (a) sharding —
tables divide by the w-axis, 13.1 GiB / 8 chips = 1.6 GiB — and (b) the
bf16 table tier for single-chip runs (6.5 GiB, reference FLT relaxed
gate 1e6*eps).  This script produces the measured evidence for (b) plus
the F1024/T2047 linear-grid fp32 run; when executed on the chip its
output is recorded under "T2047 evidence" in BASELINE.md (run in round 4
— earlier rounds shipped the runner without the measurement).

Run (real TPU):  python tools/t2047_run.py [config ...]
Configs: F1024 (linear grid, fp32 tier "highest", 8.0 GiB tables)
         O2048 (cubic octahedral, tier "bf16", 6.5 GiB tables)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

NFLD = 4  # modest field count: the viability question is table memory


def run(config: str):
    import jax
    import jax.numpy as jnp

    import ectrans_tpu as et

    name, tier = {
        "F1024": (("F1024", 2047), "highest"),
        "O2048": (("O2048", None), "bf16"),
    }[config]
    t0 = time.time()
    res = et.setup(*name)
    print(f"{config}: setup {time.time()-t0:.1f}s  T{res.nsmax} "
          f"ndgl {res.ndgl} ngptot {res.grid.ngptot}", flush=True)

    rng = np.random.default_rng(0)
    sp = rng.standard_normal((NFLD, res.nspec2)).astype(np.float32)
    sp[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
    sp[:, 0] = 0.0
    spd = jnp.asarray(sp)

    def step(x):
        g = et.inv_trans(res, spscalar=x, precision=tier)
        return et.dir_trans(res, scalars=g, precision=tier)[2]

    t0 = time.time()
    out = step(spd)
    np.asarray(out.ravel()[:1])  # force full compile + execute (axon)
    print(f"{config}: first roundtrip (incl compile) {time.time()-t0:.1f}s",
          flush=True)

    # correctness gate: reference 100*eps, or the FLT precedent 1e6*eps
    # for the bf16 tier (tests/CMakeLists.txt:316)
    err = float(np.abs(np.asarray(out) - sp).max())
    scale = float(np.abs(sp).max())
    ncheck = 1e6 if tier == "bf16" else 100
    gate = ncheck * float(np.finfo(np.float32).eps) * scale
    print(f"{config}: roundtrip err {err:.3e} gate {gate:.3e} "
          f"{'OK' if err < gate else 'FAIL'}", flush=True)

    # steady-state timing: chained executions ending in one fetch
    for _ in range(2):
        out = step(spd)
    np.asarray(out.ravel()[:1])
    iters = 5
    t0 = time.perf_counter()
    x = spd
    for _ in range(iters):
        x = step(x)
    np.asarray(x.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    gpps = res.grid.ngptot * NFLD / dt
    print(f"{config}: roundtrip {dt:.3f}s  {gpps:.3e} gp*fld/s/chip "
          f"(tier {tier})", flush=True)

    try:
        ms = jax.devices()[0].memory_stats() or {}
        print(f"{config}: device peak {ms.get('peak_bytes_in_use', 0)/2**30:.2f}"
              f" GiB / in_use {ms.get('bytes_in_use', 0)/2**30:.2f} GiB",
              flush=True)
    except Exception:
        pass
    return err < gate


def main():
    configs = sys.argv[1:] or ["F1024", "O2048"]
    ok = True
    for c in configs:
        try:
            ok &= run(c)
        except Exception as e:
            print(f"{c}: FAILED {type(e).__name__}: {e}", flush=True)
            ok = False
        finally:
            # drop the previous config's multi-GiB device tables before
            # the next setup — the lru caches otherwise hold them alive
            # and a two-config sequence OOMs a 16 GB chip (measured:
            # O2048 RESOURCE_EXHAUSTED after the F1024 run, round 4)
            from ectrans_tpu.resolution import trans_end

            trans_end()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
