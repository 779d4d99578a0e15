"""Whole-layer Fourier benchmark: is synthesis HBM-panel-bound or
MXU-pass-bound?  (Round 5; decides the attack on the 57 ms synthesis.)

Times synthesis_bucketed / analysis_bucketed at the bench's TCO1279
field counts under matmul precision variants:
  highest  — production (fp32 via multi-pass bf16)
  bf16     — single-pass matmuls, same panels/stages
If bf16 is barely faster, the layer is bound by the HBM panel traffic of
the chirp-z stages (pointwise cmuls + panel round trips between the
four-step matmuls), not by MXU passes — the lever is then stage fusion /
panel-byte reduction, not faster matmuls.

Also times the conv core in isolation per bucket to attribute panel vs
pack/unpack cost.  Results checkpointed to evidence/fft_layer.json.

Run on the chip:  python tools/fft_layer_bench.py [TCO1279]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NFLD_SYN = 26   # bench synthesis field count (uv + sc + derivatives)
NFLD_ANA = 10
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "evidence", "fft_layer.json")
RESULTS = {}


def emit(k, v):
    RESULTS[k] = v
    print(f"{k}: {v}", flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def chain_time(fn, x, iters=6):
    import jax

    out = fn(x)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(leaf.ravel()[:1])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    cur = x
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(cur)
        s = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 1e-30
        cur = cur + s.astype(cur.dtype)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return max(0.0, time.perf_counter() - t0 - rtt) / iters


def main():
    import jax
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.ops import fourier

    config = sys.argv[1] if len(sys.argv) > 1 else "TCO1279"
    res = et.setup(config)
    emit("config", f"{config} T{res.nsmax} ndgl {res.ndgl}")
    bt = fourier.bucketed_tables_for(res, jnp.float32)
    emit("buckets", [[b.i0, b.i1, b.mb, b.bt.nfft] for b in bt.buckets])
    rng = np.random.default_rng(0)

    # device-generated pseudo-data: multi-hundred-MB host uploads crawl
    # through the axon tunnel (evidence: r5 roofline session)
    def devgen(*shape):
        n = int(np.prod(shape))
        return jax.jit(lambda: jnp.sin(
            jax.lax.iota(jnp.float32, n) * 0.7).reshape(shape))()

    four = devgen(NFLD_SYN, 2, res.M, res.ndgl)
    grid = devgen(NFLD_ANA, res.ndgl, res.grid.ndlon)

    # NB: tables must be jit ARGUMENTS (pytrees), never partial/closure
    # captures — closed-over tables embed as HLO constants and the axon
    # remote compile crawls/rejects (transform.py module docstring; the
    # first version of this tool hung >25 min in compile for this reason)
    for prec in ("highest", "bf16"):
        syn = jax.jit(functools.partial(
            lambda x, mbt, prec: fourier.synthesis_bucketed(
                x, mbt, prec=prec), prec=prec))
        t = chain_time(lambda x: syn(x, bt), four)
        emit(f"synthesis_{prec}_ms", round(t * 1e3, 2))
    for prec in ("highest", "bf16"):
        ana = jax.jit(functools.partial(
            lambda x, mbt, prec: fourier.analysis_bucketed(
                x, mbt, M=res.M, prec=prec), prec=prec))
        t = chain_time(lambda x: ana(x, bt), grid)
        emit(f"analysis_{prec}_ms", round(t * 1e3, 2))

    # conv core in isolation, largest bucket, both precisions: panel cost
    bk = max(bt.buckets, key=lambda b: b.bt.nfft)
    nlat = 2 * (bk.i1 - bk.i0)
    P2 = (NFLD_SYN + 1) // 2
    ar = devgen(P2, nlat, 2 * bk.mb + 1)
    ai = devgen(P2, nlat, 2 * bk.mb + 1)
    bhr, bhi = bk.bt.syn_bh_r[None], bk.bt.syn_bh_i[None]
    panel_gb = P2 * nlat * bk.bt.nfft * 8 / 1e9

    for prec in ("highest", "bf16"):
        @functools.partial(jax.jit, static_argnames=("prec",))
        def conv(ar, ai, bhr, bhi, prec):
            vr, vi = fourier._chunked_conv(ar, ai, bhr, bhi,
                                           out_len=bk.bt.ndlon, prec=prec)
            return vr
        t = chain_time(lambda a: conv(a, ai, bhr, bhi, prec=prec), ar)
        emit(f"conv_eqbucket_{prec}", {
            "ms": round(t * 1e3, 2), "panel_gb": round(panel_gb, 3),
            "gbps_per_panelpass": round(panel_gb / t, 1)})


if __name__ == "__main__":
    main()
