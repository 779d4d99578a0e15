"""Measure this backend's achievable HBM streaming bandwidth (VERDICT r4
item 3a) and the dense LT kernel's pass-count scaling, settling whether
the Legendre layer is (a) MXU-tile-slot-bound (a multi-m/row-packed
variant would help) or (b) platform-DMA-bound (~200 GB/s ceiling — stop
chasing it).

Probes (each prints one line; all run in one process, cheapest first):
  1. xla-copy     : x + 1 over 1 GiB (XLA's own streaming rate)
  2. pallas-copy  : trivial Pallas copy kernel, 1 GiB (read+write)
  3. pallas-reduce: Pallas read+accumulate kernel, 1 GiB read, tiny write
                    (the LT table-stream analogue)
  4. dense-LT pass scaling: group_inv_dense at TCO1279 group-0 shapes,
     mode bf16 (1 MXU pass) vs bf16x3 (3) vs bf16x6 (6).  Flat time =>
     DMA-bound; linear => slot-bound.
  5. tile-size scan: the same kernel at TILE_I in {256, 512, 1280}.

Run on the chip:  python tools/roofline.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

RESULTS = {}
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "evidence", "roofline.json")


def _emit(k, v):
    RESULTS[k] = v
    print(f"{k}: {v}", flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:           # checkpoint per-probe (VERDICT #8)
        json.dump(RESULTS, f, indent=1)


def chain_time(fn, x, iters=8):
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


# ---------------------------------------------------------------- probes

N_ROWS = 512 * 512          # x (N_ROWS, 512) fp32 = 512 MiB
ROW_TILE = 512


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@jax.jit
def pallas_copy(x):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape
    grid = (n // ROW_TILE,)
    return pl.pallas_call(
        _copy_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ROW_TILE, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((ROW_TILE, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def _reduce_kernel(x_ref, o_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += x_ref[...].reshape(-1, 8, o_ref.shape[-1]).sum(axis=0)


@jax.jit
def pallas_reduce(x):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape
    grid = (n // ROW_TILE,)
    return pl.pallas_call(
        _reduce_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ROW_TILE, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def main():
    print(f"backend {jax.default_backend()}", file=sys.stderr)
    only = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    # device-generated data: a 512 MiB host upload crawls through the
    # axon tunnel and pollutes the session
    x = jax.jit(lambda: jax.lax.broadcasted_iota(
        jnp.float32, (N_ROWS, 512), 1) * 1e-3)()
    gib = x.size * 4 / 1e9

    t = chain_time(jax.jit(lambda a: a + 1.0), x)
    _emit("xla_addone_gbps_rw", round(2 * gib / t, 1))

    t = chain_time(pallas_copy, x)
    _emit("pallas_copy_gbps_rw", round(2 * gib / t, 1))

    t = chain_time(pallas_reduce, x)
    _emit("pallas_reduce_read_gbps", round(gib / t, 1))
    if only == "copy":
        return

    # dense-LT pass-count scaling at TCO1279 group-0 shapes
    from ectrans_tpu.ops import legendre_pallas as lpal

    gm, J, ig, fc2 = 80, 2562, 1280, 32
    pn = jnp.asarray(rng.standard_normal((gm, J, ig)), jnp.float32)
    dg = jnp.asarray(rng.standard_normal((gm, fc2, J)), jnp.float32)
    tab_gb = gm * J * ig * 4 / 1e9
    for mode, passes in (("bf16", 1), ("bf16x3", 3), ("bf16x6", 6)):
        t = chain_time(
            functools.partial(lpal.group_inv_dense, pn=pn, mode=mode), dg)
        _emit(f"dense_inv_{mode}", {
            "ms": round(t * 1e3, 2), "table_gbps": round(tab_gb / t, 1),
            "mxu_passes": 2 * passes})

    # hemisphere-packed kernels (round-5, ECTRANS_TPU_LEG_DENSE_PACK):
    # one dot per table tile at 2x the rows — if the kernels are
    # MXU-pass-bound this halves the LT time; numerics checked vs the
    # two-dot kernels in the same run
    d4 = jnp.concatenate([dg, dg * lpal._jsgn(J, dg.dtype)], axis=1)
    ref_n, ref_s = lpal.group_inv_dense(dg, pn, mode="bf16x6")
    o2 = lpal.group_inv_dense2(d4, pn, mode="bf16x6")
    dmax = float(jnp.max(jnp.abs(o2[:, :fc2] - ref_n)).ravel()[0])
    dmax = max(dmax, float(jnp.max(jnp.abs(o2[:, fc2:] - ref_s)).ravel()[0]))
    scale = float(jnp.max(jnp.abs(ref_n)).ravel()[0])
    _emit("dense_inv2_vs_inv_maxdiff_rel", round(dmax / scale, 9))
    for mode, passes in (("bf16x3", 3), ("bf16x6", 6)):
        t = chain_time(
            functools.partial(lpal.group_inv_dense2, pn=pn, mode=mode), d4)
        _emit(f"dense_inv2_{mode}", {
            "ms": round(t * 1e3, 2), "table_gbps": round(tab_gb / t, 1),
            "mxu_passes": passes})

    fn_ = jnp.asarray(rng.standard_normal((gm, fc2, ig)), jnp.float32)
    f4 = jnp.concatenate([fn_, fn_ * 0.5], axis=1)
    t = chain_time(
        functools.partial(lpal.group_dir_dense, fs=fn_ * 0.5, pn=pn,
                          mode="bf16x6"),
        fn_)
    _emit("dense_dir_bf16x6_ms", round(t * 1e3, 2))
    t = chain_time(
        functools.partial(lpal.group_dir_dense2, pn=pn, mode="bf16x6"), f4)
    _emit("dense_dir2_bf16x6_ms", round(t * 1e3, 2))

    # tile-size scan at bf16x6
    for ti in (256, 512, 1280):
        old = lpal.TILE_I
        lpal.TILE_I = ti
        try:
            fn2 = functools.partial(lpal.group_inv_dense, pn=pn, mode="bf16x6")
            # new jit cache entry per tile (static arg changes via module
            # constant => must clear the wrapped jit cache)
            lpal.group_inv_dense.clear_cache()
            t = chain_time(fn2, dg)
            _emit(f"dense_inv_tile{ti}_bf16x6_ms", round(t * 1e3, 2))
        finally:
            lpal.TILE_I = old
            lpal.group_inv_dense.clear_cache()


if __name__ == "__main__":
    main()
