"""Microbenchmark: Legendre grouped-contraction layout variants on TPU.

The grouped inverse-LT einsum ("mik,fcmk->fcmi") batches over m with a
per-m matmul of shape (i x k) @ (k x fc).  With the bench's fc = 32 the
output lane dimension is fc -> padded to 128 (6.4x lane waste) when XLA
puts fc last.  This script measures candidate layouts at TCO1279-like
group shapes to pick the round-3 production formulation (VERDICT item 1).

Timing per the verify-skill recipe: chain data-dependent calls, ONE
device->host 1-element fetch, subtract RTT.  The chain dependency is a
full-tensor sum (scaled by 1e-30 and added to the input) so XLA cannot
dead-code-eliminate any of the matmul work.

Usage: python tools/microbench_legendre.py [fc] [HIGHEST|HIGH|DEFAULT]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

# TCO1279-like group shapes: M=1280, ndgnh=1280, nmax=1280
M, NDGNH, NMAX = 1280, 1280, 1280
NGROUPS = 16
KMAX = NMAX // 2 + 1


def ndglu(m):
    # octahedral O1280 approximation: ndglu decreases ~linearly with m
    return max(8, int(NDGNH * (1.0 - 0.72 * m / M)))


def make_groups(dtype):
    rng = np.random.default_rng(0)
    bs = -(-M // NGROUPS)
    groups = []
    for gi in range(NGROUPS):
        m0, m1 = gi * bs, min(M, (gi + 1) * bs)
        ig = ndglu(m0)
        kg = (NMAX - m0) // 2 + 1
        p = jnp.asarray(rng.standard_normal((m1 - m0, ig, kg)), dtype)
        groups.append((m0, m1, NDGNH - ig, kg, p, p))
    return groups


def rtt_measure(x):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_time(step, x0, iters, rtt):
    """step(x, d)->d' where d' depends on every output element."""
    d = jnp.zeros((), x0.dtype)
    d = step(x0, d)
    np.asarray(d)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        d = step(x0, d)
    np.asarray(d)
    return max(0.0, time.perf_counter() - t0 - rtt) / iters


def flops(groups, fc):
    tot = 0
    for (m0, m1, i0, kg, p, _) in groups:
        tot += (m1 - m0) * (NDGNH - i0) * kg
    return tot * 2 * 2 * fc  # FMA x (sym+asym) x fc


def body(sym, groups, prec, out_spec):
    """out_spec: einsum output subscript for (m-batch, field, lat)."""
    parts = []
    axis = 0 if out_spec.startswith("m") else 1
    for (m0, m1, i0, kg, ps, pa) in groups:
        s = sym[:, m0:m1, :kg]
        fs = jnp.einsum(f"mik,fmk->{out_spec}", ps, s, precision=prec,
                        preferred_element_type=jnp.float32)
        fa = jnp.einsum(f"mik,fmk->{out_spec}", pa, s, precision=prec,
                        preferred_element_type=jnp.float32)
        north = (fs + fa).astype(sym.dtype)
        south = (fs - fa).astype(sym.dtype)[..., ::-1]
        pad = [(0, 0)] * 2
        parts.append(jnp.concatenate(
            [jnp.pad(north, pad + [(i0, 0)]), jnp.pad(south, pad + [(0, i0)])],
            axis=-1))
    return jnp.concatenate(parts, axis=axis)


def main():
    dtype = jnp.float32
    fc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    prec_name = sys.argv[2] if len(sys.argv) > 2 else "HIGHEST"
    prec = getattr(jax.lax.Precision, prec_name)
    groups = make_groups(dtype)
    rng = np.random.default_rng(1)
    sym = jnp.asarray(rng.standard_normal((fc, M, KMAX)), dtype)

    def mk(out_spec, transpose_back):
        @jax.jit
        def step(x, d):
            out = body(x + d * 1e-30, groups, prec, out_spec)
            if transpose_back:
                out = jnp.transpose(out, (1, 0, 2))
            return jnp.sum(out) * jnp.asarray(1e-30, x.dtype)
        return step

    variants = [
        ("current fmi (lanes=i, subl=f... as now)", mk("fmi", False)),
        ("mfi batch-major + transpose", mk("mfi", True)),
        ("mfi batch-major (m-major out)", mk("mfi", False)),
        ("mif (lanes=f)", mk("mif", False)),
    ]
    rtt = rtt_measure(np.zeros(1, np.float32))
    print(f"# rtt={rtt*1e3:.1f}ms fc={fc} prec={prec_name}")
    fl = flops(groups, fc)
    for name, step in variants:
        t = chain_time(step, sym, 8, rtt)
        print(f"{name:42s} {t*1e3:8.2f} ms  {fl/t/1e12:6.2f} TFLOP/s  "
              f"6-pass frac {fl*6/t/197e12:.3f}", flush=True)


if __name__ == "__main__":
    main()
