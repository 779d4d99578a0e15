"""Device-side Legendre table materializer (Pallas recurrence kernel).

Builds the full-n interleaved tables (``resolution.full_legendre`` layout,
pn[m, j, i] = P̄_{m+j}^m(mu_i)) ON DEVICE from ~13 MB of seeds and
recurrence coefficients, instead of building multi-GiB tables on the host
and uploading them (the axon tunnel uploads at 5-50 MiB/s, so host tables
cost minutes per process; the host build itself is page-fault-bound).

Math: the standard upward three-term recurrence of the fully-normalized
associated Legendre functions (``suleg_mod.F90`` / SUPOLF convention):

    eps(n,m) P̄_n = mu P̄_{n-1} - eps(n-1,m) P̄_{n-2},
    eps(n,m) = sqrt((n^2-m^2)/(4n^2-1)),

run per m over all latitudes at once (one VPU vector per n-step), seeded
with the sectoral values P̄_m^m in (mantissa, int32 exponent) form —
exponent-scaled exactly like the reference's scaled SUPOLF, because
sectoral values underflow any float format at polar latitudes for
m ~ O(10^3).  Per-step power-of-two rescaling keeps the running pair in
fp32 range; emission multiplies the mantissa by 2^E via two exp2 factors
(values below the fp32 tiny threshold flush to zero, exactly like the
stored fp32 tables).

The recurrence itself runs in compensated double-single fp32 arithmetic
(Dekker two_prod / Knuth two_sum, ~2^-45 effective precision) with the
nodes and coefficients supplied as (hi, lo) fp32 pairs of their fp64
values: a plain fp32 chain accumulates amplified rounding noise
superlinearly in the chain length (measured 2.9e-2 absolute by T639,
driven by the ~n^2 sensitivity of P̄_n to the evaluation node), while
the compensated chain stays at fp32-table rounding level — measured
max |generated - fp64-built| = 4.8e-7 (T47), 9.5e-7 (T159), 1.9e-6
(T639), flat in T (tests/test_tablegen.py).  The host build
(ECTRANS_TPU_TABLE_SOURCE=host) remains the exact-fp64 source.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

# Rescale bounds: the Veltkamp split multiplies by 2^12+1, so keep the
# scaled mantissas within 2^±16 (checked every step; per-step growth is a
# small factor, far below the remaining 2^(28-16) headroom).
RS_HI = 2.0 ** 16
RS_LO = 2.0 ** -16
RS_FAC = 2.0 ** 32
RS_FAC_INV = 2.0 ** -32
RS_SHIFT = 32
_SPLIT = 4097.0  # Veltkamp constant for fp32 (2^12 + 1)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _two_prod(a, b):
    """a*b as (product, rounding error) via Dekker/Veltkamp (no FMA
    assumption; requires |a|,|b| < 2^115 — guaranteed by the rescaler)."""
    x = a * b
    ca = a * _SPLIT
    a1 = ca - (ca - a)
    a2 = a - a1
    cb = b * _SPLIT
    b1 = cb - (cb - b)
    b2 = b - b1
    e = ((a1 * b1 - x) + a1 * b2 + a2 * b1) + a2 * b2
    return x, e


def _ds_mul(xh, xl, yh, yl):
    """Double-single multiply (x * y)."""
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    h = p + e
    return h, e - (h - p)


def _ds_sub(xh, xl, yh, yl):
    s, e = _two_sum(xh, -yh)
    e = e + (xl - yl)
    h = s + e
    return h, e - (h - s)


def _gen_kernel(ca_ref, cb_ref, sm_ref, sl_ref, se_ref, mu_ref, out_ref):
    """Generate one m's table rows: out[0, t, :] = P̄_{m+t}(mu).

    The whole recurrence runs in compensated double-single fp32
    (~2^-45 effective): a plain fp32 recurrence accumulates amplified
    rounding noise superlinearly in the chain length (measured 2.9e-2
    absolute by T639), while the compensated chain stays at fp32-table
    accuracy through T2047+.  mu and the coefficients are supplied as
    (hi, lo) fp32 pairs of their fp64 values."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    J = out_ref.shape[1]
    mu_hi = mu_ref[0, 0:1, :]
    mu_lo = mu_ref[0, 1:2, :]
    ph = sm_ref[0]                       # (1, ig) scaled seed mantissa (hi)
    pl_ = sl_ref[0]                      # (1, ig) seed mantissa low part:
    # single-fp32 seeds cost ~2^-24 relative error that the chain carries
    # into every row — measured 1.9e-6 absolute on the emitted tables at
    # T639 (round 3's roundtrip-error regression); (hi, lo) seeds put the
    # whole chain at double-single accuracy, leaving only the fp32
    # emission rounding (~6e-8).
    E = se_ref[0]                        # (1, ig) int32 exponent
    qh = jnp.zeros_like(ph)
    ql = jnp.zeros_like(ph)
    odt = out_ref.dtype

    def emit(h, l, Ev):
        Ec = jnp.clip(Ev, -252, 252)
        E1 = jnp.right_shift(Ec, 1)
        E2 = Ec - E1
        return ((h + l) * jnp.exp2(E1.astype(jnp.float32))
                * jnp.exp2(E2.astype(jnp.float32)))

    def body(t, carry):
        qh, ql, ph, pl_, E = carry
        out_ref[0, pl.dslice(t, 1), :] = emit(ph, pl_, E).astype(odt)
        ah = ca_ref[0, 0, 2 * (t + 1)]
        al = ca_ref[0, 0, 2 * (t + 1) + 1]
        bh = cb_ref[0, 0, 2 * (t + 1)]
        bl = cb_ref[0, 0, 2 * (t + 1) + 1]
        th, tl = _ds_mul(mu_hi, mu_lo, ph, pl_)
        uh, ul = _ds_mul(ah, al, th, tl)
        vh, vl = _ds_mul(bh, bl, qh, ql)
        rh, rl = _ds_sub(uh, ul, vh, vl)
        mag = jnp.abs(rh)
        big = mag > RS_HI
        sml = (mag < RS_LO) & (mag > 0)
        fac = jnp.where(big, jnp.float32(RS_FAC_INV),
                        jnp.where(sml, jnp.float32(RS_FAC), 1.0))
        dE = jnp.where(big, RS_SHIFT, jnp.where(sml, -RS_SHIFT, 0))
        return (ph * fac, pl_ * fac, rh * fac, rl * fac,
                E + dE.astype(jnp.int32))

    jax.lax.fori_loop(0, J, body, (qh, ql, ph, pl_, E))


@functools.partial(jax.jit, static_argnames=("J", "out_dtype", "interpret"))
def _gen_group(coefA, coefB, seed_mant, seed_lo, seed_exp, mu, J,
               out_dtype="float32", interpret=False):
    """Materialize one group's table (gm, J, ig) on device.

    coefA/coefB: (gm, 2*(J+2)) lane-interleaved (hi, lo) recurrence
    coefficient pairs (SMEM scalars); seed_mant/seed_lo/seed_exp:
    (gm, 1, ig) — (hi, lo) double-single seed mantissas + int32 exponents;
    mu: (1, 2, ig) — (hi, lo) node pairs."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, _, ig = seed_mant.shape
    out = jax.ShapeDtypeStruct((gm, J, ig), out_dtype)
    assert mu.shape == (1, 2, ig), mu.shape
    return pl.pallas_call(
        _gen_kernel,
        grid=(gm,),
        in_specs=[
            pl.BlockSpec((1, 1, coefA.shape[2]), lambda m: (m, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, coefB.shape[2]), lambda m: (m, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ig), lambda m: (m, 0, 0)),
            pl.BlockSpec((1, 1, ig), lambda m: (m, 0, 0)),
            pl.BlockSpec((1, 1, ig), lambda m: (m, 0, 0)),
            pl.BlockSpec((1, 2, ig), lambda m: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, J, ig), lambda m: (m, 0, 0)),
        out_shape=out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coefA, coefB, seed_mant, seed_lo, seed_exp, mu)


@functools.lru_cache(maxsize=4)
def _host_inputs(res):
    """Tiny host-side recurrence inputs: seeds (mant, exp) and per-(m, t)
    coefficients A = 1/eps(m+t), B = eps(m+t-1)/eps(m+t)."""
    from ..legendre import eps_table, sectoral_seeds

    nsmax = res.nsmax
    ndgnh = res.ndgnh
    M = nsmax + 1
    nmax = nsmax + 1
    mu = np.asarray(res.mu[:ndgnh], np.float64)
    nmen = np.asarray(res.nmen[:ndgnh])

    smant64, sexp64 = sectoral_seeds(nsmax, mu)
    m2, e2 = np.frexp(smant64)
    sexp = (sexp64 + e2).astype(np.int32)
    smant = m2.astype(np.float32)
    slo = (m2 - smant.astype(np.float64)).astype(np.float32)
    mask = np.arange(M)[:, None] <= nmen[None, :]
    smant = np.where(mask, smant, np.float32(0.0))
    slo = np.where(mask, slo, np.float32(0.0))

    eps = eps_table(nsmax, 3)
    T = nmax + 3
    ts = np.arange(T)
    ms = np.arange(M)
    nmat = ms[:, None] + ts[None, :]
    nclip = np.minimum(nmat, nsmax + 3)
    en = eps[np.minimum(ms, nsmax)[:, None], nclip]
    enm1 = eps[np.minimum(ms, nsmax)[:, None], np.maximum(nclip - 1, 0)]
    valid = (ts[None, :] >= 1) & (nmat <= nmax) & (en > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        A = np.where(valid, 1.0 / np.where(en == 0, 1.0, en), 0.0)
        B = np.where(valid, enm1 / np.where(en == 0, 1.0, en), 0.0)

    def ds(x):
        """fp64 -> lane-interleaved (hi, lo) fp32 pairs along axis 1."""
        hi = x.astype(np.float32)
        lo = (x - hi.astype(np.float64)).astype(np.float32)
        out = np.empty((x.shape[0], 2 * x.shape[1]), np.float32)
        out[:, 0::2] = hi
        out[:, 1::2] = lo
        return out

    mu_hi = mu.astype(np.float32)
    mu_lo = (mu - mu_hi.astype(np.float64)).astype(np.float32)
    mu2 = np.stack([mu_hi, mu_lo], axis=0)[None]    # (1, 2, ndgnh)
    return (ds(A), ds(B), smant, slo, sexp, mu2)


def materialize_full_legendre(res, dtype_str="float32",
                              ngroups: int = 16, interpret=False):
    """Build a resolution's FullLegendre tables on device (same group
    structure as the host build in ``Resolution.full_legendre``)."""
    import jax.numpy as jnp

    from ..resolution import FullGroup, FullLegendre

    A, B, smant, slo, sexp, mu = _host_inputs(res)
    M, ndgnh, nmax = res.M, res.ndgnh, res.nsmax + 1
    bs = -(-M // ngroups)
    groups = []
    for gi in range(ngroups):
        m0 = gi * bs
        m1 = min(M, m0 + bs)
        if m0 >= M:
            break
        ig = int(res.ndglu[m0])
        i0 = ndgnh - ig
        kg = (nmax - m0) // 2 + 1
        J = 2 * kg
        gm = m1 - m0
        # generate fp32, cast after: Mosaic rejects 1-sublane dynamic
        # stores at bf16 tiling (16, 128)
        pn = _gen_group(
            jnp.asarray(A[m0:m1, None, : 2 * (J + 2)]),
            jnp.asarray(B[m0:m1, None, : 2 * (J + 2)]),
            jnp.asarray(smant[m0:m1, None, i0:]),
            jnp.asarray(slo[m0:m1, None, i0:]),
            jnp.asarray(sexp[m0:m1, None, i0:]),
            jnp.asarray(mu[:, :, i0:]),
            J=J, out_dtype="float32", interpret=interpret,
        )
        if dtype_str != "float32":
            pn = pn.astype(dtype_str)
        groups.append(FullGroup(m0=m0, m1=m1, i0=i0, J=J, pn=pn))
    return FullLegendre(groups=tuple(groups), ndgnh=ndgnh, kmax=res.kmax)
