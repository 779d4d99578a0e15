"""Benchmark: inverse+direct spectral-transform round trip throughput.

Mirrors the reference benchmark driver (``src/programs/ectrans-benchmark.F90``:
timed inv_trans/dir_trans loop with analytic correctness gating) on one TPU
chip.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "gridpoints/s/chip", "vs_baseline": N}

Config mirrors the BASELINE.json target ladder: tries TCO1279 (O1280 grid,
the reference's headline resolution), falls back to TCO639 if the chip can't
hold the dense Legendre tensors.  Throughput counts grid points x fields per
transform pair per second.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

NFLD_SC = 6
NFLD_UV = 2
ITERS = 10
WARMUP = 2

# round-1 reference point for vs_baseline (our own first measurement at
# TCO639; updated as rounds progress). BASELINE.json.published is empty —
# the reference publishes no absolute numbers.
BASELINE_GPPS = {"TCO639": 2.0e8, "TCO1279": 1.0e8}


def run(config: str):
    import jax
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.transform import InvFlags

    res = et.setup(config)
    flags = InvFlags(scders=True, uvders=True)
    rng = np.random.default_rng(0)

    def packed(n):
        x = rng.standard_normal((n, res.nspec2)).astype(np.float32)
        x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
        x[:, 0] = 0.0
        return jnp.asarray(x)

    spvor, spdiv, spsc = packed(NFLD_UV), packed(NFLD_UV), packed(NFLD_SC)

    # NB: no outer jax.jit — inv_trans/dir_trans are jitted internally with
    # the precomputed tables passed as arguments (an outer jit would inline
    # the tables into the HLO as multi-GB constants).
    def step(spvor, spdiv, spsc):
        grid = et.inv_trans(res, spvor=spvor, spdiv=spdiv, spscalar=spsc, flags=flags)
        u = grid[0:NFLD_UV]
        v = grid[NFLD_UV : 2 * NFLD_UV]
        sc = grid[2 * NFLD_UV : 2 * NFLD_UV + NFLD_SC]
        return et.dir_trans(res, u=u, v=v, scalars=sc)

    for _ in range(WARMUP):
        out = step(spvor, spdiv, spsc)
        jax.block_until_ready(out)

    # correctness gate (reference: --check, ectrans-benchmark.F90:850-860)
    err = float(jnp.max(jnp.abs(out[2] - spsc)))
    if not np.isfinite(err) or err > 1e-2:
        raise RuntimeError(f"correctness gate failed: roundtrip err {err}")

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(spvor, spdiv, spsc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS

    nfld_total = 2 * NFLD_UV + NFLD_SC  # u, v, scalars transformed both ways
    gpps = res.grid.ngptot * nfld_total / dt
    return gpps, dt, err


def main():
    import time as _t

    budget = float(os.environ.get("ECTRANS_BENCH_BUDGET_S", "1500"))
    order = os.environ.get("ECTRANS_BENCH_CONFIGS", "TCO639,TCO1279").split(",")
    t0 = _t.time()
    results = {}
    for config in order:
        if results and (budget - (_t.time() - t0)) < 420:
            print(f"# skipping {config}: bench time budget", file=sys.stderr)
            break
        try:
            results[config] = run(config)
        except Exception as e:  # OOM / compile failure: keep earlier result
            print(f"# {config} failed: {type(e).__name__}: {e}", file=sys.stderr)
    if not results:
        raise SystemExit(1)
    config = order[-1] if order[-1] in results else next(iter(results))
    for c in reversed(order):
        if c in results:
            config = c
            break
    gpps, dt, err = results[config]
    print(
        json.dumps(
            {
                "metric": f"{config} inv+dir roundtrip throughput",
                "value": round(gpps, 1),
                "unit": "gridpoints/s/chip",
                "vs_baseline": round(gpps / BASELINE_GPPS[config], 3),
                "detail": {
                    "sec_per_roundtrip": round(dt, 4),
                    "nfld": 2 * NFLD_UV + NFLD_SC,
                    "roundtrip_err": err,
                    "all": {k: round(v[0], 1) for k, v in results.items()},
                },
            }
        )
    )


if __name__ == "__main__":
    main()
