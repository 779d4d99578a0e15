"""Four-step (Cooley-Tukey N = N1*N2) FFT built from MXU matmuls.

The TPU-native way to run the Bluestein convolution FFTs: instead of
log2(N) memory-bound radix-2 sweeps (each a full HBM round trip with
pathological tilings — the pure-XLA loop in ``realfft.py`` OOMs at
TCO1279), the DFT is factored as

    X[k1 + N1*k2] = DFT_N2( W_N^(n2*k1) * DFT_N1(x[n1*N2 + n2]) )

with both inner DFTs executed as dense (N1, N1) / (N2, N2) complex matrix
multiplies over the whole batch — exactly the shape the MXU wants (the
same philosophy as the reference GPU backend feeding cuFFT,
``hicfft.cuda.cu``, but expressed as matmuls instead of a vendor FFT).
Three HBM round trips total, no tiny-lane tensors, no unrolled stages.

Ordering: the forward transform leaves results in (k1, k2) layout — flat
position p = k1*N2 + k2 holds natural frequency k1 + N1*k2 (``ord_map``).
The inverse kernel is the exact transposed network: it consumes that
layout and emits natural order.  Inside a Bluestein convolution the
pointwise table is simply pre-permuted on the host, so no device
reordering ever happens.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# fp32 matmul pass count for the DFT/twiddle matmuls, keyed by the public
# precision tier.  NB the FFT layer runs FULL fp32 (6-pass) at BOTH the
# "highest" and "high" tiers: at 3 passes the chirp-z convolution lengths
# (~4k at TCO1279) amplify the 2^-21 operand rounding past the reference's
# 100*eps(fp32) benchmark gate (measured 3.3e-4 vs gate 6.3e-5 at TCO1279),
# while the Legendre layer at 3 passes stays inside (3.7e-5).  The split
# mirrors the reference GPU backend's own precision choices: reduced-
# precision Legendre GEMMs (CUTLASS 3xTF32, ``hicblas_cutlass.cuda.h``)
# with full-fp32 cuFFT.  The bf16 tier reduces both layers and is gated at
# the reference's relaxed FLT precedent (1e6*eps).
_TIER_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGHEST,
    "bf16": jax.lax.Precision.DEFAULT,
}
_PREC = jax.lax.Precision.HIGHEST


def _fft_prec_override():
    """ECTRANS_TPU_FFT_PREC overrides the FFT-layer pass count
    independently of the public precision argument (mixed-precision
    experiments: the LT and FFT layers have different error-vs-resolution
    slopes — see _TIER_PREC)."""
    import os

    v = os.environ.get("ECTRANS_TPU_FFT_PREC", "")
    m = {"highest": jax.lax.Precision.HIGHEST,
         "high": jax.lax.Precision.HIGH,
         "bf16": jax.lax.Precision.DEFAULT}
    return m.get(v) if v else None


def _factor(n: int) -> tuple[int, int]:
    """Split n = N1 * N2 with the lane factor N2 = 128 when possible (TPU
    tiles pad the last dim to 128 lanes, so any other N2 wastes physical
    memory); otherwise as square as possible."""
    if n % 128 == 0 and 2 <= n // 128 <= 512:
        return n // 128, 128
    n1 = int(np.sqrt(n))
    while n % n1:
        n1 -= 1
    return n1, n // n1


def good_size(target: int) -> int:
    """Smallest transform length >= target of the form k*128 (lane-aligned
    four-step factors; a pow-2 length would pad the Bluestein convolution
    by up to 2x)."""
    if target <= 256:
        return target
    return -(-target // 128) * 128


def ord_map(n: int) -> np.ndarray:
    """Flat forward-output position p = k1*N2 + k2 -> natural frequency
    k1 + N1*k2."""
    if n <= 256:
        return np.arange(n)
    n1, n2 = _factor(n)
    k1 = np.arange(n1)[:, None]
    k2 = np.arange(n2)[None, :]
    return (k1 + n1 * k2).reshape(-1)


@functools.lru_cache(maxsize=32)
def _tables_np(n: int, dtype_str: str):
    """Host DFT matrices + twiddles for both directions (numpy).

    Converted to device constants per trace at the call site: these are a
    few small (<=256 x 256) matrices, safely embedded in the HLO."""
    dt = np.dtype(dtype_str)

    def dft(m, sign):
        k = np.arange(m)
        ang = sign * 2.0 * np.pi * np.outer(k, k % m) / m
        return np.cos(ang).astype(dt), np.sin(ang).astype(dt)

    out = {}
    if n <= 256:
        out["f_r"], out["f_i"] = dft(n, -1.0)
        out["b_r"], out["b_i"] = dft(n, +1.0)
        return out
    n1, n2 = _factor(n)
    for nm, m in (("f1", n1), ("f2", n2)):
        out[nm + "_r"], out[nm + "_i"] = dft(m, -1.0)
        out[nm + "b_r"], out[nm + "b_i"] = dft(m, +1.0)
    k1 = np.arange(n1)[:, None]
    nn2 = np.arange(n2)[None, :]
    ang = -2.0 * np.pi * (k1 * nn2) / n
    out["tw_r"] = np.cos(ang).astype(dt)
    out["tw_i"] = np.sin(ang).astype(dt)
    return out


def _tables(n: int, dtype_str: str):
    return {k: jnp.asarray(v) for k, v in _tables_np(n, dtype_str).items()}


def _cmatmul(ar, ai, br, bi, spec, prec=None):
    """Complex einsum via Karatsuba: 3 real contractions instead of 4
    (the matmuls are memory-bound multi-pass fp32 on the MXU, so pass
    count is the cost): m1 = a_r b_r, m2 = a_i b_i, m3 = (a_r+a_i)(b_r+b_i);
    re = m1 - m2, im = m3 - m1 - m2."""
    p = _PREC if prec is None else _TIER_PREC.get(prec, prec)
    p = _fft_prec_override() or p
    m1 = jnp.einsum(spec, ar, br, precision=p)
    m2 = jnp.einsum(spec, ai, bi, precision=p)
    m3 = jnp.einsum(spec, ar + ai, br + bi, precision=p)
    return m1 - m2, m3 - m1 - m2


def fft_ord(re, im, n: int | None = None, prec=None):
    """Forward FFT of length n over the last axis; output in ord_map order.

    The inputs may be SHORTER than n (implicitly zero-padded): the first
    DFT matmul is then pruned to the occupied n1-rows — inside a Bluestein
    convolution the signal occupies only mmax+1 (synthesis) or nloen
    (analysis) of the nfft slots, so pruning skips most of step 1.
    """
    if n is None:
        n = re.shape[-1]
    t = _tables(n, str(re.dtype))
    if n <= 256:
        re = _pad_to(re, n)
        im = _pad_to(im, n)
        return _cmatmul(re, im, t["f_r"], t["f_i"], "...n,kn->...k", prec)
    n1, n2 = _factor(n)
    in_len = re.shape[-1]
    f1 = -(-in_len // n2)  # occupied n1-rows
    re = _pad_to(re, f1 * n2)
    im = _pad_to(im, f1 * n2)
    xr = re.reshape(re.shape[:-1] + (f1, n2))
    xi = im.reshape(im.shape[:-1] + (f1, n2))
    # DFT over n1 (columns, pruned to the occupied rows): A[k1, n2]
    ar, ai = _cmatmul(xr, xi, t["f1_r"][:, :f1], t["f1_i"][:, :f1],
                      "...fn,kf->...kn", prec)
    # twiddle W_N^(k1*n2)
    ar, ai = ar * t["tw_r"] - ai * t["tw_i"], ar * t["tw_i"] + ai * t["tw_r"]
    # DFT over n2: X[k1, k2]
    br, bi = _cmatmul(ar, ai, t["f2_r"], t["f2_i"], "...kn,ln->...kl", prec)
    shape = re.shape[:-1] + (n,)
    return br.reshape(shape), bi.reshape(shape)


def ifft_from_ord(re, im, out_len: int | None = None, prec=None):
    """Inverse FFT consuming ord_map order, emitting natural order, with
    the 1/n normalisation (exact transposed network of fft_ord with
    conjugated coefficients).  With out_len, only the first out_len
    natural-order outputs are computed (the final DFT matmul is pruned);
    the result's last axis is then ceil(out_len/n2)*n2 >= out_len.
    """
    n = re.shape[-1]
    t = _tables(n, str(re.dtype))
    if n <= 256:
        orr, oii = _cmatmul(re, im, t["b_r"], t["b_i"], "...n,kn->...k", prec)
        if out_len is not None:
            orr, oii = orr[..., :out_len], oii[..., :out_len]
        return orr / n, oii / n
    n1, n2 = _factor(n)
    xr = re.reshape(re.shape[:-1] + (n1, n2))
    xi = im.reshape(im.shape[:-1] + (n1, n2))
    # conj DFT over k2
    ar, ai = _cmatmul(xr, xi, t["f2b_r"], t["f2b_i"], "...kl,nl->...kn", prec)
    # conj twiddle
    ar, ai = ar * t["tw_r"] + ai * t["tw_i"], ai * t["tw_r"] - ar * t["tw_i"]
    # conj DFT over k1, pruned to the needed output rows
    fo = n1 if out_len is None else min(n1, -(-out_len // n2))
    br, bi = _cmatmul(ar, ai, t["f1b_r"][:fo], t["f1b_i"][:fo],
                      "...kn,fk->...fn", prec)
    shape = re.shape[:-1] + (fo * n2,)
    return br.reshape(shape) / n, bi.reshape(shape) / n


def _pad_to(x, n):
    if x.shape[-1] == n:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
