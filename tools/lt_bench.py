"""Microbenchmark: Legendre-kernel formulations at TCO1279 group shapes.

Times, on the real chip, the pieces of each LT engine separately —
operand packing (XLA) vs the Pallas group kernel vs the full per-group
call — so engine decisions rest on measured numbers, not tile-cost
models.  Run: python tools/lt_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ectrans_tpu.ops import legendre_planes as lp          # noqa: E402
from ectrans_tpu.ops import legendre_pallas as lpal        # noqa: E402


def chain_time(fn, x, iters=8, tag=""):
    """Wall time of fn(x) with a scalar data-dependency chain + one fetch."""
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
    print(f"backend {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    # TCO1279 group-0 shapes
    gm, J, ig = 80, 2562, 1280
    for fc2 in (20, 32):
        pn = jnp.asarray(rng.standard_normal((gm, J, ig)), jnp.float32)
        tpl = jax.jit(lambda p: tuple(
            q.swapaxes(1, 2) for q in lp.split_planes(p, 3)))(pn)
        tpl = jax.block_until_ready(tpl)
        npl = jax.jit(lambda p: tuple(lp.split_planes(p, 3)))(pn)
        npl = jax.block_until_ready(npl)

        dg = jnp.asarray(rng.standard_normal((gm, fc2, J)), jnp.float32)
        a_packed = jax.block_until_ready(lp._pack_inv_rows(dg, 3))
        t_pack = chain_time(lambda d: lp._pack_inv_rows(d, 3), dg)
        t_kern = chain_time(
            lambda a: lp.group_inv_planes(a, tpl, 3, fc2), a_packed)
        t_dense = chain_time(
            lambda d: lpal.group_inv_dense(d, pn, mode="bf16x6"), dg)
        gb = gm * J * ig * 4 / 1e9
        print(f"INV fc2={fc2}: pack={t_pack*1e3:.2f}ms "
              f"planes-kernel={t_kern*1e3:.2f}ms "
              f"({gb*1.5/t_kern:.0f} GB/s of bf16-plane bytes)  "
              f"dense-bf16x6={t_dense*1e3:.2f}ms ({gb/t_dense:.0f} GB/s fp32)",
              flush=True)

        fn_ = jnp.asarray(rng.standard_normal((gm, fc2, ig)), jnp.float32)
        w_packed = jax.block_until_ready(lp._pack_dir_rows(fn_, fn_, 3))
        t_wpack = chain_time(lambda f: lp._pack_dir_rows(f, f, 3), fn_)
        t_dkern = chain_time(
            lambda w: lp.group_dir_planes(w, tpl, 3, fc2), w_packed)
        t_ddense = chain_time(
            lambda f: lpal.group_dir_dense(f, f, pn, mode="bf16x6"), fn_)
        print(f"DIR fc2={fc2}: pack={t_wpack*1e3:.2f}ms "
              f"planes-kernel={t_dkern*1e3:.2f}ms "
              f"({gb*1.5/t_dkern:.0f} GB/s)  "
              f"dense-bf16x6={t_ddense*1e3:.2f}ms ({gb/t_ddense:.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
