"""Plane-split Legendre-transform kernels (the "planes" engine).

STATUS (round 4, measured on v5e/axon): OPT-IN EXPERIMENT, not the
production engine.  The occupancy theory below predicted ~4x over the
dense-row kernels, but these kernels lower pathologically on this
backend (7-22 GB/s of table stream vs the dense kernels' 193 GB/s;
end-to-end TCO1279 Legendre 42.3/30.5 ms inv/dir vs dense 37.6/24.1).
Enable with ECTRANS_TPU_LEG_KERNEL=planes; the limb-split utility
(split_planes) is used elsewhere and is production code.

TPU-native re-design of the grouped Legendre GEMMs (reference LEINV/LEDIR,
``leinv_mod.F90:99-185``, ``ledir_mod.F90:126-175``; grouped GPU GEMMs
``gpu/internal/leinv_mod.F90:273-317``) built around how the bf16 MXU
actually prices an fp32-accurate contraction.

Why the round-3 kernels were slow (measured 98-154 GB/s of table stream
against ~819 GB/s HBM): an fp32 contraction on the bf16 MXU is built from
bf16 passes, and every pass streams a full 128-row/128-lane tile through
the MXU no matter how few rows/lanes carry data.  The round-3 kernels ran
2 dots x 6 passes = 12 tile-streams per table element with only
2*nfld <= 40 of 128 rows occupied — neither compute- nor bandwidth-bound,
just tile-slot-bound.

This engine restructures the arithmetic so the TABLE (the big operand) is
streamed exactly ``nplanes`` times in bf16, with the small coefficient
operand's limb planes PACKED INTO THE OTHERWISE-IDLE ROWS:

* The fp32 tables are pre-split at setup into ``nplanes`` bf16 limb
  planes P0, P1, P2 (P0+P1+P2 == fp32 table to ~2^-25): stored in HBM as
  bf16, so the per-direction table stream is 2*nplanes bytes/entry.
* The fp32 coefficients are split into limb planes too, and all planes of
  all fields of BOTH hemisphere combinations ride one activation matrix:
  rows [x0; x0*sgn; x1; x1*sgn; x2; x2*sgn] (6*nfld2 rows).
* Pass k contracts table plane Pk against the activation-row prefix with
  limb index j <= nplanes-1-k, so the kept products are exactly the
  bf16x6-style expansion Sum_{j+k<nplanes} xj*Pk — full fp32-mantissa
  coverage in nplanes=3 table streams (the dropped j+k >= 3 terms are
  < 2^-24 relative), ~4x fewer MXU tile-slots than round 3.
* North/south never need separate table reads: south applies the parity
  identity P(n, -mu) = (-1)^(n-m) P(n, mu) via sign rows (inverse) or a
  per-column sign (direct), exactly like the round-3 dense-row kernels.

Layout: ONE stored layout — the TRANSPOSED (lat, J) planes — serves both
directions (storing the natural layout too would double table HBM to
~10 GiB at TCO1279 and OOM the chip next to the working set).  The direct
kernel streams it with the contraction axis (latitude) in lanes; the
inverse contracts over J via the rhs-lane-contraction dot (the _DN_T
pattern of the round-3 kernels) plus a per-tile in-register transpose of
the small (TILE_I, fc2) result, emitting the m-major contract of the
dense-row engine ((gm, nfld2, lat) / (gm, nfld2, J) realigned rows).

Precision tiers: nplanes=3 covers fp32 ("highest"/"high"); nplanes=1 is
the single-bf16 tier (table stream halves vs fp32 storage — the memory
mode standing in for the reference's butterfly compression, gated at the
FLT precedent 1e6*eps, ``tests/CMakeLists.txt:316``).  NB under this
engine "high" is an alias of "highest" (both run the full 3-plane
fp32-accurate contraction): the dense engines' cheaper ~2^-21 bf16x3
mode has no 2-plane equivalent here because dropping the third plane
loses the lo*lo cross terms that keep the fp32 mantissa covered.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_I = 256   # latitude-tile (lane) extent per inverse grid step
TILE_J = 256   # coefficient-tile (lane) extent per direct grid step

_TIER_PLANES = {"highest": 3, "high": 3, "bf16": 1}


def planes_for_tier(precision: str) -> int:
    """Plane count per precision tier.  NB under this engine "high" is an
    ALIAS of "highest" (both 3 planes = full fp32-accurate contraction):
    the limb formulation has no natural ~2^-21 middle tier — 2 planes
    carry 16 mantissa bits on the TABLE side only, which measured outside
    the 100*eps gate, so the cheaper-than-fp32 role is served by the
    1-plane bf16 tier instead."""
    return _TIER_PLANES.get(precision, 3)


def supported() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def split_planes(x, nplanes: int):
    """fp32 -> list of nplanes bf16 limb planes summing to x (~2^-25).

    The limbs are extracted by BITWISE mantissa truncation, not by
    round-trip casts: XLA's excess-precision simplification folds
    ``x - f32(bf16(x))`` patterns away inside larger programs (the bf16
    rounding is elided), silently zeroing the low limbs — measured on the
    axon backend as single-bf16 accuracy whenever the split fuses into an
    outer jit.  Masking the low 16 mantissa bits yields a value exactly
    representable in bf16, the subtraction is exact (Sterbenz), and no
    convert pair exists for the simplifier to fold."""
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    mask = jnp.uint32(0xFFFF0000)
    outs = []
    rem = x
    for _ in range(nplanes - 1):
        hi = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(rem, jnp.uint32) & mask,
            jnp.float32)
        outs.append(hi.astype(jnp.bfloat16))
        rem = rem - hi
    outs.append(rem.astype(jnp.bfloat16))
    return outs


def _sgn_lanes(n, dtype):
    """(1, n) array of (-1)^lane."""
    par = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) & 1
    return (1 - 2 * par).astype(dtype)


# ----------------------------------------------------------------------
# Inverse kernel: realigned coefficient rows -> Fourier per latitude.
#   act  PTk (TILE_I, J) bf16 plane tiles (TRANSPOSED layout — the only
#        stored layout; both directions stream it, halving table HBM)
#   wts  A (2*P*fc2, J)  bf16: rows [x0; x0*sgn; x1; x1*sgn; ...]
#   out  north, south (fc2, TILE_I)
# Pass k contracts table plane PTk against the coefficient-row prefix
# with limb j <= P-1-k (rhs-lane contraction, the proven _DN_T pattern),
# yielding (TILE_I, rows); lane-group sums + an in-register transpose
# emit the m-major (fc2, TILE_I) contract directly.
# ----------------------------------------------------------------------


def _inv_kernel(a_ref, *refs, fc2, nplanes):
    p_refs = refs[:nplanes]
    n_ref, s_ref = refs[nplanes], refs[nplanes + 1]
    f32 = jnp.float32
    a = a_ref[0]
    north = None
    south = None
    for k in range(nplanes):
        rows = 2 * (nplanes - k) * fc2
        o = jax.lax.dot_general(
            p_refs[k][0], a[:rows],
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        for j in range(nplanes - k):
            nj = o[:, 2 * j * fc2 : (2 * j + 1) * fc2]
            sj = o[:, (2 * j + 1) * fc2 : (2 * j + 2) * fc2]
            north = nj if north is None else north + nj
            south = sj if south is None else south + sj
    n_ref[0] = north.T.astype(n_ref.dtype)
    s_ref[0] = south.T.astype(s_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nplanes", "fc2", "interpret"))
def group_inv_planes(a, tplanes, nplanes, fc2, interpret=False):
    """One group's inverse LT: a (gm, 2*nplanes*fc2, J) bf16 packed
    coefficient rows x tplanes (tuple of (gm, ig, J) bf16 transposed
    limb planes) -> (north, south) each (gm, fc2, ig) f32; south NOT
    latitude-reversed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, rows, J = a.shape
    ig = tplanes[0].shape[1]
    ti = min(TILE_I, ig)
    grid = (gm, pl.cdiv(ig, ti))
    out = jax.ShapeDtypeStruct((gm, fc2, ig), jnp.float32)
    kern = functools.partial(_inv_kernel, fc2=fc2, nplanes=nplanes)
    in_specs = [pl.BlockSpec((1, rows, J), lambda m, it: (m, 0, 0))]
    in_specs += [pl.BlockSpec((1, ti, J), lambda m, it: (m, it, 0))
                 for _ in range(nplanes)]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, fc2, ti), lambda m, it: (m, 0, it)),
            pl.BlockSpec((1, fc2, ti), lambda m, it: (m, 0, it)),
        ],
        out_shape=[out, out],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a, *tplanes)


# ----------------------------------------------------------------------
# Direct kernel: weighted Fourier rows -> realigned coefficient rows.
#   act  W (2*P*fc2, ig) bf16: rows [gn0; gs0; gn1; gs1; ...]
#        (gn = north*w limb planes, gs = south*w limb planes)
#   tabs PTk (ig, TILE_J) bf16 plane tiles (transposed layout)
#   out  rows (fc2, TILE_J): a + b*(-1)^j  (quadrature already in W)
# ----------------------------------------------------------------------


def _dir_kernel(w_ref, *refs, fc2, nplanes):
    from jax.experimental import pallas as pl

    p_refs = refs[:nplanes]
    o_ref = refs[nplanes]
    f32 = jnp.float32
    w = w_ref[0]
    aa = None
    bb = None
    for k in range(nplanes):
        rows = 2 * (nplanes - k) * fc2
        o = jax.lax.dot_general(
            w[:rows], p_refs[k][0],
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        for j in range(nplanes - k):
            nj = o[2 * j * fc2 : (2 * j + 1) * fc2]
            sj = o[(2 * j + 1) * fc2 : (2 * j + 2) * fc2]
            aa = nj if aa is None else aa + nj
            bb = sj if bb is None else bb + sj
    tj = aa.shape[-1]
    j0 = pl.program_id(1) * tj
    par = (jax.lax.broadcasted_iota(jnp.int32, (1, tj), 1) + j0) & 1
    sgn = (1 - 2 * par).astype(f32)
    o_ref[0] = (aa + bb * sgn).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nplanes", "fc2", "interpret"))
def group_dir_planes(w, tplanes, nplanes, fc2, interpret=False):
    """One group's direct LT: w (gm, 2*nplanes*fc2, ig) bf16 packed
    weighted-Fourier rows x tplanes (tuple of (gm, ig, J) bf16) ->
    realigned rows (gm, fc2, J) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, rows, ig = w.shape
    J = tplanes[0].shape[2]
    tj = min(TILE_J, J)
    grid = (gm, pl.cdiv(J, tj))
    out = jax.ShapeDtypeStruct((gm, fc2, J), jnp.float32)
    kern = functools.partial(_dir_kernel, fc2=fc2, nplanes=nplanes)
    in_specs = [pl.BlockSpec((1, rows, ig), lambda m, it: (m, 0, 0))]
    in_specs += [pl.BlockSpec((1, ig, tj), lambda m, it: (m, 0, it))
                 for _ in range(nplanes)]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, fc2, tj), lambda m, it: (m, 0, it)),
        out_shape=out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w, *tplanes)


# ----------------------------------------------------------------------
# XLA-side operand packing (small tensors; all ops fuse into relayouts)
# ----------------------------------------------------------------------


def _pack_inv_rows(dg, nplanes):
    """(gm, fc2, J) fp32 realigned coefficients -> (gm, 2*P*fc2, J) bf16
    packed rows [x0; x0*sgn; x1; x1*sgn; ...].

    The packed operand is materialised behind an optimization_barrier:
    fusing the limb-split/concat chain into surrounding ops miscompiles
    on the axon TPU backend (silently wrong results in the full jitted
    transform; every isolated call is exact — the same fusion pathology
    as fourier.py's Hermitian pack)."""
    sgn = _sgn_lanes(dg.shape[-1], dg.dtype)[None]
    parts = []
    for p in split_planes(dg, nplanes):
        parts.append(p)
        parts.append((p.astype(dg.dtype) * sgn).astype(jnp.bfloat16))
    return jax.lax.optimization_barrier(jnp.concatenate(parts, axis=1))


def _pack_dir_rows(fn, fs, nplanes):
    """(gm, fc2, ig) fp32 weighted north/south -> (gm, 2*P*fc2, ig) bf16
    packed rows [gn0; gs0; gn1; gs1; ...]."""
    pn_ = split_planes(fn, nplanes)
    ps_ = split_planes(fs, nplanes)
    parts = []
    for k in range(nplanes):
        parts.append(pn_[k])
        parts.append(ps_[k])
    return jax.lax.optimization_barrier(jnp.concatenate(parts, axis=1))


def legendre_inv_planes(dense, ppl, nplanes=3, interpret=False):
    """Plane-engine inverse LT: (nfld, 2, M, NP) dense spectral ->
    (nfld, 2, M, ndgl) fourier north->south (ppl: resolution.PlanesLegendre).

    Reference semantics: LEINV + ASRE1B recombination
    (``leinv_mod.F90:99-185``, ``asre1b_mod.F90:84-102``)."""
    from .legendre_pallas import _diag_realign

    nfld = dense.shape[0]
    fc2 = 2 * nfld
    d2 = _diag_realign(dense)
    parts = []
    for g in ppl.groups:
        gm = g.m1 - g.m0
        dg = d2[:, :, g.m0:g.m1, :g.J].reshape(fc2, gm, g.J).swapaxes(0, 1)
        a = _pack_inv_rows(dg, nplanes)
        north, south = group_inv_planes(a, g.pt[:nplanes], nplanes, fc2,
                                        interpret=interpret)
        north = north.astype(dense.dtype).swapaxes(0, 1).reshape(
            nfld, 2, gm, -1)
        south = south.astype(dense.dtype).swapaxes(0, 1).reshape(
            nfld, 2, gm, -1)[..., ::-1]
        pad = [(0, 0)] * 3
        parts.append(jnp.concatenate(
            [jnp.pad(north, pad + [(g.i0, 0)]),
             jnp.pad(south, pad + [(0, g.i0)])], axis=-1))
    return jnp.concatenate(parts, axis=2)


def legendre_dir_rows_planes(fourier, ppl, w, nplanes=3, interpret=False):
    """Plane-engine direct LT emitting the m-major NATIVE layout: a list of
    per-group (gm, 2*nfld, J) realigned rows (c-major sublanes), the input
    contract of the packed-compaction kernel.  Quadrature weights applied
    (reference LEDIR, ``ledir_mod.F90:126-175``)."""
    nfld = fourier.shape[0]
    fc2 = 2 * nfld
    ndgnh = ppl.ndgnh
    fc = fourier.swapaxes(0, 1)               # (2, nfld, M, ndgl): c-major
    north_all = fc[..., :ndgnh]
    south_all = fc[..., : ndgnh - 1 : -1]
    fn_all = north_all * w
    fs_all = south_all * w
    fn_all, fs_all = jax.lax.optimization_barrier((fn_all, fs_all))
    rows = []
    for g in ppl.groups:
        gm = g.m1 - g.m0
        fn = fn_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        fs = fs_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        wrows = _pack_dir_rows(fn, fs, nplanes)
        rows.append(group_dir_planes(wrows, g.pt[:nplanes], nplanes, fc2,
                                     interpret=interpret)
                    .astype(fourier.dtype))
    return rows


def legendre_dir_planes(fourier, ppl, w, NP, nplanes=3, interpret=False):
    """Plane-engine direct LT to the dense layout: (nfld, 2, M, ndgl) ->
    (nfld, 2, M, NP) dense spectral rows."""
    from .legendre_pallas import _diag_unalign

    nfld = fourier.shape[0]
    fc2 = 2 * nfld
    ndgnh = ppl.ndgnh
    north_all = fourier[..., :ndgnh]
    south_all = fourier[..., : ndgnh - 1 : -1]
    fn_all = north_all * w
    fs_all = south_all * w
    fn_all, fs_all = jax.lax.optimization_barrier((fn_all, fs_all))
    W1 = NP + 1
    parts = []
    for g in ppl.groups:
        gm = g.m1 - g.m0
        fn = fn_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        fs = fs_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        wrows = _pack_dir_rows(fn, fs, nplanes)
        d2g = group_dir_planes(wrows, g.pt[:nplanes], nplanes, fc2,
                               interpret=interpret).astype(fourier.dtype)
        d2g = d2g.swapaxes(0, 1).reshape(nfld, 2, gm, g.J)
        parts.append(jnp.pad(d2g, [(0, 0)] * 3 + [(0, W1 - g.J)]))
    d2 = jnp.concatenate(parts, axis=2)
    return _diag_unalign(d2, NP)
