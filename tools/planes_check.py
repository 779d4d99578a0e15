"""On-chip validation + microbenchmark of the plane-split LT kernels.

Runs the compiled Pallas kernels on the real TPU against a HIGHEST-precision
XLA einsum reference (itself fp32-accurate on this backend) at a ladder of
shapes, reporting max relative error per case — the same methodology as
tools/tpu_selftest.py (this backend has a history of silent miscompiles, so
every new kernel family gets an on-chip ladder before it ships).

Usage: python tools/planes_check.py [--bench]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ectrans_tpu.ops import legendre_planes as lp  # noqa: E402


def ref_inv(dg, pn):
    """f32-accurate reference of the inverse group kernel semantics."""
    J = dg.shape[-1]
    sgn = (1 - 2 * (jnp.arange(J) % 2)).astype(dg.dtype)[None, None, :]
    n = jnp.einsum("mfj,mji->mfi", dg, pn,
                   precision=jax.lax.Precision.HIGHEST)
    s = jnp.einsum("mfj,mji->mfi", dg * sgn, pn,
                   precision=jax.lax.Precision.HIGHEST)
    return n, s


def ref_dir(fn, fs, pn):
    J = pn.shape[1]
    sgn = (1 - 2 * (jnp.arange(J) % 2)).astype(fn.dtype)[None, None, :]
    a = jnp.einsum("mfi,mji->mfj", fn, pn,
                   precision=jax.lax.Precision.HIGHEST)
    b = jnp.einsum("mfi,mji->mfj", fs, pn,
                   precision=jax.lax.Precision.HIGHEST)
    return a + sgn * b


def run_case(gm, fc2, J, ig, nplanes=3, seed=0, table="random"):
    rng = np.random.default_rng(seed)
    if table == "random":
        pn = jnp.asarray(rng.standard_normal((gm, J, ig)), jnp.float32)
    else:  # legendre-like decaying dynamic range
        base = rng.standard_normal((gm, J, ig))
        decay = np.exp(-np.linspace(0, 60, ig))[None, None, :]
        pn = jnp.asarray(base * decay, jnp.float32)
    planes = tuple(lp.split_planes(pn, nplanes))
    tplanes = tuple(p.swapaxes(1, 2) for p in planes)

    dg = jnp.asarray(rng.standard_normal((gm, fc2, J)), jnp.float32)
    a = lp._pack_inv_rows(dg, nplanes)
    n, s = lp.group_inv_planes(a, tplanes, nplanes, fc2)
    rn, rs = ref_inv(dg, pn)
    scale = float(jnp.max(jnp.abs(rn)))
    einv = max(float(jnp.max(jnp.abs(n - rn))),
               float(jnp.max(jnp.abs(s - rs)))) / scale

    fn = jnp.asarray(rng.standard_normal((gm, fc2, ig)), jnp.float32)
    fs = jnp.asarray(rng.standard_normal((gm, fc2, ig)), jnp.float32)
    w = lp._pack_dir_rows(fn, fs, nplanes)
    o = lp.group_dir_planes(w, tplanes, nplanes, fc2)
    ro = ref_dir(fn, fs, pn)
    edir = float(jnp.max(jnp.abs(o - ro))) / float(jnp.max(jnp.abs(ro)))
    return einv, edir


def main():
    print(f"backend: {jax.default_backend()}  {jax.devices()}",
          file=sys.stderr)
    cases = [
        # gm, fc2, J, ig
        (4, 16, 64, 128),      # everything aligned
        (4, 20, 64, 128),      # fc2 not a multiple of 8 (row slices at 20)
        (4, 20, 50, 48),       # unaligned J, ig (O48-like group)
        (8, 32, 98, 96),       # 16-field inverse shapes
        (8, 20, 642, 640),     # mid TCO1279-like group
        (3, 20, 162, 328),     # ragged tail group
    ]
    bad = 0
    for gm, fc2, J, ig in cases:
        for nplanes in (3, 1):
            tol = 2e-6 if nplanes == 3 else 3e-2
            einv, edir = run_case(gm, fc2, J, ig, nplanes)
            ok = einv < tol and edir < tol
            bad += 0 if ok else 1
            print(f"gm={gm} fc2={fc2} J={J} ig={ig} planes={nplanes}: "
                  f"inv={einv:.2e} dir={edir:.2e} "
                  f"{'ok' if ok else '** FAIL **'}")
    print("ALL OK" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
