"""Measure the sharded pipeline's overhead vs the single-device path
(VERDICT r3 item 5): run ShardedTransform on a (1, 1) mesh — one real
chip, full shard_map pipeline with degenerate collectives — against the
single-device transform at the same config/fields, and report the ratio.

The reference analogue: the GPU backend runs the SAME engine for every
decomposition (gpu/internal/leinv_mod.F90), so 1-rank MPI vs serial costs
only the (empty) alltoallv.  As of round 5 the sharded path runs the
production dense-row engine AND the bucketed Fourier layer (length-sorted
latitude distribution), so the remaining ratio is collectives/copies,
the psum pack gather, and layout-boundary gathers.  Round-5 history:
2.45x before the bucketed-Fourier port (evidence/r5_sharded_overhead.log,
with the gap attributed inv 19.8->51.9 / dir 10.3->26.7 ms and the
unbucketed Fourier measured worth ~15 ms via FFT_BUCKETS=1).

Run on the chip:  python tools/sharded_overhead.py [TCO639]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NFLD_SC, NFLD_UV = 6, 2
ITERS = 6


def chain(fn, args, label):
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(leaf.ravel()[:1])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    dt = max(0.0, time.perf_counter() - t0 - rtt) / ITERS
    print(f"{label}: {dt*1e3:.1f} ms/roundtrip", flush=True)
    return dt


def main():
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.parallel import ShardedTransform, make_mesh
    from ectrans_tpu.transform import InvFlags

    config = sys.argv[1] if len(sys.argv) > 1 else "TCO639"
    res = et.setup(config)
    print(f"{config}: T{res.nsmax} ndgl {res.ndgl}", flush=True)
    rng = np.random.default_rng(0)

    def packed(n):
        x = rng.standard_normal((n, res.nspec2)).astype(np.float32)
        x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
        x[:, 0] = 0.0
        return jnp.asarray(x)

    spvor, spdiv, spsc = packed(NFLD_UV), packed(NFLD_UV), packed(NFLD_SC)
    flags = InvFlags(scders=True, uvders=True)

    def single(sv, sd, ss):
        grid = et.inv_trans(res, spvor=sv, spdiv=sd, spscalar=ss, flags=flags)
        u = grid[0:NFLD_UV]
        v = grid[NFLD_UV : 2 * NFLD_UV]
        sc = grid[2 * NFLD_UV : 2 * NFLD_UV + NFLD_SC]
        return et.dir_trans(res, u=u, v=v, scalars=sc)

    t_single = chain(single, (spvor, spdiv, spsc), "single-device")

    st = ShardedTransform(res, make_mesh(1, 1), dtype=jnp.float32)

    def sharded(sv, sd, ss):
        grid = st.inv_trans(spvor=sv, spdiv=sd, spscalar=ss, flags=flags)
        u = grid[0:NFLD_UV]
        v = grid[NFLD_UV : 2 * NFLD_UV]
        sc = grid[2 * NFLD_UV : 2 * NFLD_UV + NFLD_SC]
        return st.dir_trans(u=u, v=v, scalars=sc)

    t_sharded = chain(sharded, (spvor, spdiv, spsc), "sharded mesh=(1,1)")
    print(f"overhead ratio: {t_sharded/t_single:.2f}x", flush=True)

    # on-chip correctness: sharded vs single outputs (guards the sharded
    # engine/layout reformulations against silent-lowering defects the
    # interpret-mode CPU tests cannot see)
    ref = [np.asarray(x) for x in single(spvor, spdiv, spsc)]
    got = [np.asarray(x) for x in sharded(spvor, spdiv, spsc)]
    worst = max(np.abs(g - r).max() / max(np.abs(r).max(), 1e-30)
                for g, r in zip(got, ref))
    print(f"sharded-vs-single max rel delta: {worst:.3e}", flush=True)
    gate = 1e-4  # fp32 roundtrip class; layout bugs show up at O(1)
    print(f"correctness: {'PASS' if worst < gate else 'FAIL'} "
          f"(gate {gate:g})", flush=True)


if __name__ == "__main__":
    main()
