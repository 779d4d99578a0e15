"""Microbenchmark: Fourier-conv matmul formulations at TCO1279 bucket shapes.

Compares, per four-step DFT stage shape, on the real chip:
  A. the production formulation (complex Karatsuba, 3 einsums at HIGHEST)
  B. complex-as-real single einsum with K-packed bf16 limb segments
     (one dot, K = 12*f; weights host-precomputed)
plus accuracy of B against f64.

B's math: for complex x (re, im) and complex DFT matrix t, out = x @ t is
one REAL matmul A (rows, 2K) @ W (2K, 2n) with A = [xr | xi] and
W = [[tr, ti], [-ti, tr]]; fp32 accuracy on the bf16 MXU comes from
splitting both into limbs and stacking the 6 kept limb pairs along K.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ectrans_tpu.ops import fft_fourstep  # noqa: E402
from ectrans_tpu.ops.legendre_planes import split_planes  # noqa: E402


def _np_split3(a):
    """numpy: fp32 -> 3 bf16-valued fp32 limbs via mantissa masking."""
    out = []
    rem = a.astype(np.float32)
    for _ in range(2):
        hi = (rem.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
        out.append(hi)
        rem = rem - hi
    out.append(rem)
    return out


def pack_weights(tr, ti):
    """Host: complex DFT matrix (K, N) -> K-packed limb weights
    (12K, 2N) bf16 for the 6 kept limb pairs (xj, tk), j+k<=2."""
    imp = np.block([[tr, ti], [-ti, tr]])  # (2K, 2N) real form
    limbs = _np_split3(imp)
    pairs = [(0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1)]
    import ml_dtypes

    W = np.concatenate([limbs[k] for (_, k) in pairs], axis=0)
    return jnp.asarray(W.astype(ml_dtypes.bfloat16)), pairs


def pack_acts(xr, xi, pairs):
    """Device: (rows, K) re/im fp32 -> (rows, 12K) bf16 limb segments."""
    lr = split_planes(xr, 3)
    li = split_planes(xi, 3)
    segs = []
    for (j, _) in pairs:
        segs.append(jnp.concatenate([lr[j], li[j]], axis=-1))
    return jnp.concatenate(segs, axis=-1)


@jax.jit
def stage_A(xr, xi, tr, ti):
    m1 = jnp.einsum("bf,fk->bk", xr, tr, precision=jax.lax.Precision.HIGHEST)
    m2 = jnp.einsum("bf,fk->bk", xi, ti, precision=jax.lax.Precision.HIGHEST)
    m3 = jnp.einsum("bf,fk->bk", xr + xi, tr + ti,
                    precision=jax.lax.Precision.HIGHEST)
    return m1 - m2, m3 - m1 - m2


@jax.jit
def stage_B(xr, xi, W):
    pairs = [(0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1)]
    a = pack_acts(xr, xi, pairs)
    a = jax.lax.optimization_barrier(a)
    o = jax.lax.dot_general(a, W, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    n = o.shape[-1] // 2
    return o[:, :n], o[:, n:]


def chain_time(fn, args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    x = args
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*x)
        s = o[0].ravel()[0] * 1e-30   # scalar data dependency
        x = (x[0] + s, x[1]) + x[2:]
    np.asarray(x[0].ravel()[:1])
    return max(0.0, time.perf_counter() - t0 - rtt) / iters


def run_shape(rows, K, N, tag):
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((rows, K)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((rows, K)), jnp.float32)
    ang = rng.uniform(0, 2 * np.pi, (K, N))
    tr64, ti64 = np.cos(ang), np.sin(ang)
    tr = jnp.asarray(tr64, jnp.float32)
    ti = jnp.asarray(ti64, jnp.float32)
    W, pairs = pack_weights(tr64.astype(np.float32), ti64.astype(np.float32))

    ar, ai = stage_A(xr, xi, tr, ti)
    br, bi = stage_B(xr, xi, W)
    rr = np.asarray(xr, np.float64) @ tr64 - np.asarray(xi, np.float64) @ ti64
    sc = np.abs(rr).max()
    eA = np.abs(np.asarray(ar) - rr).max() / sc
    eB = np.abs(np.asarray(br) - rr).max() / sc

    tA = chain_time(lambda r, i: stage_A(r, i, tr, ti), (xr, xi))
    tB = chain_time(lambda r, i: stage_B(r, i, W), (xr, xi))
    print(f"{tag}: rows={rows} K={K} N={N}  A={tA*1e3:.2f}ms errA={eA:.1e}  "
          f"B={tB*1e3:.2f}ms errB={eB:.1e}  speedup={tA/tB:.2f}x", flush=True)


def main():
    print(f"backend {jax.default_backend()}", file=sys.stderr)
    # TCO1279 synthesis equator bucket: 13 pairs x 214 rows, nfft=7808=61x128
    # step1 (pruned): contract f1~21 occupied rows of n1=61, batched over n2
    # -> flattened rows = 13*214*128
    run_shape(13 * 214 * 128, 21, 61, "syn-eq step1")
    run_shape(13 * 214 * 61, 128, 128, "syn-eq step2")
    run_shape(13 * 214 * 61, 128, 128, "syn-eq istep1")
    run_shape(13 * 214 * 128, 61, 41, "syn-eq istep2(pruned)")
    # mid bucket: nfft ~ 3968 = 31x128
    run_shape(13 * 214 * 128, 11, 31, "syn-mid step1")
    run_shape(13 * 214 * 31, 128, 128, "syn-mid step2")


if __name__ == "__main__":
    main()
