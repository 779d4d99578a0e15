"""Pallas TPU kernel: fused Bluestein convolution (four-step FFT -> chirp
multiply -> inverse four-step FFT) resident in VMEM.

The XLA implementation of the convolution core (``fft_fourstep`` driven by
``fourier._chunked_conv``) is bandwidth-bound: each of the ~12 matmul
passes (4 complex matmul stages x Karatsuba x fp32 multi-pass) round-trips
the whole (batch, nfft) panel through HBM — ~25 GB per TCO639 round trip.
This kernel performs the entire convolution on one VMEM-resident panel per
batch block: one HBM read of the input, one write of the output, with the
DFT factor matrices (a few (<=128, <=512) bf16-limb tables) broadcast to
every block.

STATUS: correct on TPU but currently ~45% slower than the XLA path
(19.9 vs 13.4 ms at TCO639 shapes; tried: transpose-free dataflow, small
contractions as unrolled VPU FMAs, block sizes 32..128 — XLA's global
scheduling of the multi-pass matmuls wins), so it is NOT the default —
set ECTRANS_TPU_PALLAS_CONV=1 to experiment.  Kept as the Pallas
integration point for future per-architecture tuning.

fp32 matmul precision on the bf16 MXU uses the standard 2-limb split with
3 cross terms (a_hi b_hi + a_hi b_lo + a_lo b_hi) explicitly, accumulating
in fp32 — equivalent to jax.lax.Precision.HIGHEST's leading terms.

Layout per block: (BLK batch rows, n1 sublanes, n2=128 lanes); the
per-latitude chirp table rows ride the same block index map.  Only used
when the transform length factors as (n1, 128) (``fft_fourstep.good_size``
guarantees it above 256); the XLA path remains the fallback and the CPU
reference.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fft_fourstep

_BLK = 32


def _split2_np(a: np.ndarray):
    """fp32 -> (hi, lo) bf16 limbs (numpy/ml_dtypes)."""
    import ml_dtypes

    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=16)
def _matrix_tables(n: int):
    """Host DFT factor matrices for length n, as bf16 limb pairs, oriented
    for in-kernel dots (contraction on the last axis of the data)."""
    t = fft_fourstep._tables_np(n, "float32")
    n1, n2 = fft_fourstep._factor(n)
    out = {}
    # forward step 1 contracts the occupied f1-rows: keep full (n1, n1),
    # sliced in the kernel builder.  Orientations:
    #   s1: x (b, n2, f1) . M (f1, k1)   -> f1-contraction: M = f1^T
    #   s2: x (b, k1, n2) . M (n2, k2)   -> M = f2^T
    #   i1: y (b, k1, k2) . M (k2, n)    -> M = f2b^T
    #   i2: y (b, n2, k1) . M (k1, fo)   -> M = f1b^T
    for nm, mat in (
        ("s1", t["f1_r"].T), ("s1i", t["f1_i"].T),
        ("s2", t["f2_r"].T), ("s2i", t["f2_i"].T),
        ("i1", t["f2b_r"].T), ("i1i", t["f2b_i"].T),
        ("i2", t["f1b_r"].T), ("i2i", t["f1b_i"].T),
    ):
        hi, lo = _split2_np(np.ascontiguousarray(mat))
        out[nm + "_hi"] = hi
        out[nm + "_lo"] = lo
    out["tw_r"] = t["tw_r"]
    out["tw_i"] = t["tw_i"]
    return out, n1, n2


def _mm(x, m_hi, m_lo):
    """fp32-precision matmul of fp32 x against bf16-limb matrix (contract
    last axis of x): x_hi m_hi + x_lo m_hi + x_hi m_lo, fp32 accumulate."""
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda a, b: jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return d(x_hi, m_hi) + d(x_lo, m_hi) + d(x_hi, m_lo)


def _cmm(xr, xi, m_hi, m_lo, mi_hi, mi_lo):
    # 4-term complex product (NB: limb-level Karatsuba is invalid — sums of
    # bf16 limb matrices are not bf16-representable and destroy precision)
    rr = _mm(xr, m_hi, m_lo)
    ii = _mm(xi, mi_hi, mi_lo)
    ri = _mm(xr, mi_hi, mi_lo)
    ir = _mm(xi, m_hi, m_lo)
    return rr - ii, ri + ir


def _small_contract(xr, xi, mr, mi, axis_len, nout):
    """Unrolled VPU contraction over a small axis-1 (f1/k1 <= ~32):
    out[:, k, :] = sum_j M[j, k] * x[:, j, :], complex.  Scalars come from
    host numpy matrices mr/mi (n_in, n_out) baked as constants."""
    outs_r, outs_i = [], []
    for k in range(nout):
        accr = None
        for j in range(axis_len):
            cr, ci = float(mr[j, k]), float(mi[j, k])
            tr = cr * xr[:, j, :] - ci * xi[:, j, :]
            ti = cr * xi[:, j, :] + ci * xr[:, j, :]
            accr = tr if accr is None else accr + tr
            acci = ti if j == 0 else acci + ti
        outs_r.append(accr[:, None, :])
        outs_i.append(acci[:, None, :])
    return (jnp.concatenate(outs_r, axis=1), jnp.concatenate(outs_i, axis=1))


def _conv_kernel(ar_ref, ai_ref, bhr_ref, bhi_ref,
                 s1h, s1l, s1ih, s1il, s2h, s2l, s2ih, s2il,
                 i1h, i1l, i1ih, i1il, i2h, i2l, i2ih, i2il,
                 twr_ref, twi_ref, or_ref, oi_ref, *, n1, n2, f1, fo, in_len,
                 m1np, m2np):
    blk = ar_ref.shape[0]
    ar = ar_ref[...]
    ai = ai_ref[...]
    pad = f1 * n2 - in_len
    if pad:
        ar = jnp.pad(ar, ((0, 0), (0, pad)))
        ai = jnp.pad(ai, ((0, 0), (0, pad)))
    # step 1 (small contraction over the f1 occupied rows): VPU FMAs,
    # transpose-free -> (b, k1, n2)
    xr = ar.reshape(blk, f1, n2)
    xi = ai.reshape(blk, f1, n2)
    xr, xi = _small_contract(xr, xi, m1np[0], m1np[1], f1, n1)
    # twiddle (k1, n2)
    twr = twr_ref[...][None]
    twi = twi_ref[...][None]
    xr, xi = xr * twr - xi * twi, xr * twi + xi * twr
    # step 2: contract n2 (lanes) on the MXU -> (b, k1, k2)
    xr, xi = _cmm(xr, xi, s2h[...], s2l[...], s2ih[...], s2il[...])
    # chirp pointwise (per-row bh table), layout (b, k1, k2)
    bhr = bhr_ref[...].reshape(blk, n1, n2)
    bhi = bhi_ref[...].reshape(blk, n1, n2)
    xr, xi = xr * bhr - xi * bhi, xr * bhi + xi * bhr
    # inverse step 1: contract k2 (lanes) on the MXU -> (b, k1, n)
    xr, xi = _cmm(xr, xi, i1h[...], i1l[...], i1ih[...], i1il[...])
    # conj twiddle
    xr, xi = xr * twr + xi * twi, xi * twr - xr * twi
    # inverse step 2 (small contraction over k1): VPU FMAs -> (b, fo, n2)
    xr, xi = _small_contract(xr, xi, m2np[0], m2np[1], n1, fo)
    scale = 1.0 / (n1 * n2)
    or_ref[...] = xr.reshape(blk, fo * n2) * scale
    oi_ref[...] = xi.reshape(blk, fo * n2) * scale


@functools.lru_cache(maxsize=32)
def _build_call(n: int, in_len: int, out_len: int, nrows: int,
                interpret: bool):
    tabs, n1, n2 = _matrix_tables(n)
    f1 = min(n1, -(-in_len // n2))
    fo = min(n1, -(-out_len // n2))
    t = fft_fourstep._tables_np(n, "float32")
    # step-1 matrix (f1, k1) and inverse step-2 matrix (k1, fo), fp32 host
    m1np = (t["f1_r"].T[:f1], t["f1_i"].T[:f1])
    m2np = (t["f1b_r"].T[:, :fo], t["f1b_i"].T[:, :fo])
    kernel = functools.partial(_conv_kernel, n1=n1, n2=n2, f1=f1, fo=fo,
                               in_len=in_len, m1np=m1np, m2np=m2np)
    mats = [jnp.asarray(tabs[k]) for k in
            ("s1_hi", "s1_lo", "s1i_hi", "s1i_lo",
             "s2_hi", "s2_lo", "s2i_hi", "s2i_lo",
             "i1_hi", "i1_lo", "i1i_hi", "i1i_lo",
             "i2_hi", "i2_lo", "i2i_hi", "i2i_lo",
             "tw_r", "tw_i")]

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def call(ar, ai, bhr, bhi):
        b = ar.shape[0]
        grid = (b // _BLK,)
        row_spec = lambda w: pl.BlockSpec((_BLK, w), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row_spec(in_len), row_spec(in_len),
                      row_spec(n), row_spec(n)]
                     + [full(m.shape) for m in mats],
            out_specs=[row_spec(fo * n2), row_spec(fo * n2)],
            out_shape=[jax.ShapeDtypeStruct((b, fo * n2), jnp.float32)] * 2,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(ar, ai, bhr, bhi, *mats)

    return jax.jit(call), fo * n2


def supported(n: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32 or n <= 256:
        return False
    n1, n2 = fft_fourstep._factor(n)
    return n2 == 128 and n1 <= 128


def bluestein_conv(ar, ai, bhr, bhi, out_len, interpret: bool = False):
    """Fused convolution: inputs (..., rows, in_len) fp32 with per-row chirp
    tables bh (rows, n); returns (..., rows, >=out_len) natural order.

    The leading dims are flattened into row blocks; bh rows must broadcast
    over the leading dims (same per-latitude table for every field).
    """
    n = bhr.shape[-1]
    lead = ar.shape[:-2]
    rows = ar.shape[-2]
    in_len = ar.shape[-1]
    b = int(np.prod(lead)) * rows if lead else rows
    ar2 = ar.reshape(b, in_len)
    ai2 = ai.reshape(b, in_len)
    # tile per-lat tables across the flattened leading dims
    nlat = bhr.reshape(-1, n).shape[0]
    reps = b // nlat
    bhr2 = jnp.tile(bhr.reshape(nlat, n), (reps, 1))
    bhi2 = jnp.tile(bhi.reshape(nlat, n), (reps, 1))
    pad = (-b) % _BLK
    if pad:
        zp = [(0, pad), (0, 0)]
        ar2 = jnp.pad(ar2, zp)
        ai2 = jnp.pad(ai2, zp)
        bhr2 = jnp.pad(bhr2, zp)
        bhi2 = jnp.pad(bhi2, zp)
    call, out_w = _build_call(n, in_len, out_len, ar2.shape[0], interpret)
    orr, oii = call(ar2, ai2, bhr2, bhi2)
    orr = orr[:b].reshape(lead + (rows, out_w))
    oii = oii[:b].reshape(lead + (rows, out_w))
    return orr, oii
