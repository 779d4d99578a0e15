"""Pallas grouped-GEMM Legendre transforms (HBM-streaming MXU kernels).

At TCO1279 the grouped P̄ tables are ~1.6 GB and each transform direction
streams them exactly once; the arithmetic intensity is only
``2 * nfld2 / 4 ≈ 16`` FLOP/byte — far below the fp32 MXU ridge.  The XLA
batched-einsum formulation reaches only ~20% of HBM bandwidth on this
backend; these kernels stream the tables through VMEM with the Pallas
pipeline (double-buffered block fetches) and keep the small per-m
coefficient blocks resident.

Measured bound — SETTLED round 5 (v5e/axon, evidence/roofline.json):
the layer is PLATFORM-DMA-BOUND, not MXU-pass-bound.  Three
measurements close the round-4 question:
(a) kernel time is FLAT in MXU pass count — group-0 inverse at bf16x3
    (6 passes) 6.7 ms vs bf16x6 (12 passes) 5.56 ms (189 GB/s);
(b) a trivial Pallas copy kernel moves 165 GB/s (r+w) and a pure
    read-reduce kernel 95 GB/s — hand-written kernels on this backend
    cap near ~200 GB/s of HBM stream, far under the ~819 GB/s nominal,
    so the dense kernels at 189 GB/s already sit AT the achievable
    ceiling;
(c) a hemisphere-packed one-dot-per-tile variant (group_inv_dense2,
    2x MXU row occupancy, ECTRANS_TPU_LEG_DENSE_PACK=1) measures the
    same 5.72 ms — confirming passes are not the cost (kept opt-in,
    default off; its bf16x3 lowering is pathological, 199 ms).
Tile-size scan 256/512/1280: flat (5.0-5.3 ms).  Conclusion: at the
"highest" tier the Legendre wall is the platform's kernel-DMA bound;
further gains require fewer table bytes (bf16 tier) or w-sharding —
not kernel work.  The round-4 planes engine (7-22 GB/s) remains
demoted.  bench.py reports measured bytes-moved/s per direction
(legendre_gbps) so this bound stays a measured number.

Reference counterpart: the grouped GEMMs of the GPU backend
(``gpu/internal/leinv_mod.F90:273-317``, ``ledir_mod.F90:126-175``), which
batch all fields of all m into single device GEMM streams for the same
reason.

Precision: the MXU is a bf16 systolic array; fp32 contractions are built
from bf16 passes.  ``mode``:

- ``"bf16x3"`` (default): split both operands into (hi, lo) bf16 and take
  the three significant cross products — ~2^-21 relative error, well
  inside the reference's 100*eps(fp32) correctness gate, at half the MXU
  passes of XLA's ``Precision.HIGHEST`` (6 passes).
- ``"bf16"``: single bf16 pass (the measured low-precision mode; the
  reference's own FLT precedent gates such paths at 1e6*eps,
  ``tests/CMakeLists.txt:316``).
- ``"f32"``: native f32 dot (Mosaic chooses the pass count) — used on CPU
  / interpret mode where the MXU model does not apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_I = 512   # latitude-tile (lane) extent streamed per grid step
TILE_K = 512   # coefficient-tile extent for the direct kernel


def supported() -> bool:
    """Pallas TPU kernels need a real TPU-like backend."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _split_bf16(x, parts=2):
    """Split fp32 into `parts` bf16 terms summing (approximately) to x."""
    out = []
    rem = x
    for _ in range(parts - 1):
        hi = rem.astype(jnp.bfloat16)
        rem = rem - hi.astype(jnp.float32)
        out.append(hi)
    out.append(rem.astype(jnp.bfloat16))
    return out


def _dot(a, b, dn, mode):
    """fp32-accumulated contraction of a and b via bf16 MXU passes."""
    f32 = jnp.float32
    if mode == "f32":
        return jax.lax.dot_general(a, b, dn, preferred_element_type=f32)
    if mode == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
            preferred_element_type=f32)
    if mode == "bf16x3":
        ahi, alo = _split_bf16(a)
        bhi, blo = _split_bf16(b)
        acc = jax.lax.dot_general(ahi, bhi, dn, preferred_element_type=f32)
        acc = acc + jax.lax.dot_general(ahi, blo, dn, preferred_element_type=f32)
        acc = acc + jax.lax.dot_general(alo, bhi, dn, preferred_element_type=f32)
        return acc
    if mode == "bf16x6":
        # 3-way split, keeping every product above 2^-24 relative:
        # hh, hm, mh, hl, lh, mm — full fp32-mantissa coverage
        a0, a1, a2 = _split_bf16(a, 3)
        b0, b1, b2 = _split_bf16(b, 3)
        acc = jax.lax.dot_general(a0, b0, dn, preferred_element_type=f32)
        for x, y in ((a0, b1), (a1, b0), (a0, b2), (a2, b0), (a1, b1)):
            acc = acc + jax.lax.dot_general(x, y, dn, preferred_element_type=f32)
        return acc
    raise ValueError(f"unknown pallas LT mode {mode!r}")


# Inverse: contract k with the stored (ig, kg) tile — rhs-transposed dot
# (keeps ONE stored table layout for both directions; the direct kernel
# gets the natural (k-last-contracted-first) orientation).
_DN_T = (((1,), (1,)), ((), ()))
# Direct: contract i, natural orientation.
_DN_N = (((1,), (0,)), ((), ()))


def _inv_kernel(s_ref, a_ref, ps_ref, pa_ref, n_ref, so_ref, *, mode):
    sm = s_ref[0]                 # (fc2, kg) resident coefficients for m
    am = a_ref[0]
    ps = ps_ref[0]                # (TILE_I, kg) streamed table tile
    pa = pa_ref[0]
    fs = _dot(sm, ps, _DN_T, mode)
    fa = _dot(am, pa, _DN_T, mode)
    dt = n_ref.dtype
    n_ref[0] = (fs + fa).astype(dt)
    so_ref[0] = (fs - fa).astype(dt)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def group_inv(sym, asym, psym, pasym, mode="bf16x3", interpret=False):
    """One group's inverse LT: (gm, fc2, kg) coeffs x (gm, ig, kg) tables
    -> (north, south) each (gm, fc2, ig); south NOT latitude-reversed.

    The m axis leads every operand so each block's LAST TWO dims satisfy
    the TPU lowering rule (divisible by (8, 128) or equal to the array
    dims): coeff block (1, fc2, kg) keeps (fc2, kg) whole, table block
    (1, TILE_I, kg) tiles latitudes in lane-aligned chunks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, fc2, kg = sym.shape
    ig = psym.shape[1]
    ti = min(TILE_I, ig)
    grid = (gm, pl.cdiv(ig, ti))
    out = jax.ShapeDtypeStruct((gm, fc2, ig), sym.dtype)
    kern = functools.partial(_inv_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, fc2, kg), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, fc2, kg), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, ti, kg), lambda m, it: (m, it, 0)),
            pl.BlockSpec((1, ti, kg), lambda m, it: (m, it, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, fc2, ti), lambda m, it: (m, 0, it)),
            pl.BlockSpec((1, fc2, ti), lambda m, it: (m, 0, it)),
        ],
        out_shape=[out, out],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sym, asym, psym, pasym)


def _dir_kernel(fs_ref, fa_ref, ps_ref, pa_ref, s_ref, a_ref, *, mode):
    fs = fs_ref[0]                # (fc2, ig) quadrature-weighted fourier
    fa = fa_ref[0]
    ps = ps_ref[0]                # (ig, TILE_K)
    pa = pa_ref[0]
    dt = s_ref.dtype
    s_ref[0] = _dot(fs, ps, _DN_N, mode).astype(dt)
    a_ref[0] = _dot(fa, pa, _DN_N, mode).astype(dt)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def group_dir(fsym, fasym, psym, pasym, mode="bf16x3", interpret=False):
    """One group's direct LT: (gm, fc2, ig) weighted fourier x (gm, ig, kg)
    tables -> (sym, asym) each (gm, fc2, kg).  m leads every operand so
    block last-two dims satisfy the TPU lowering rule (see group_inv)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, fc2, ig = fsym.shape
    kg = psym.shape[2]
    tk = min(TILE_K, kg)
    grid = (gm, pl.cdiv(kg, tk))
    out = jax.ShapeDtypeStruct((gm, fc2, kg), fsym.dtype)
    kern = functools.partial(_dir_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, fc2, ig), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, fc2, ig), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, ig, tk), lambda m, it: (m, 0, it)),
            pl.BlockSpec((1, ig, tk), lambda m, it: (m, 0, it)),
        ],
        out_specs=[
            pl.BlockSpec((1, fc2, tk), lambda m, it: (m, 0, it)),
            pl.BlockSpec((1, fc2, tk), lambda m, it: (m, 0, it)),
        ],
        out_shape=[out, out],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fsym, fasym, psym, pasym)


# ----------------------------------------------------------------------
# Dense-row kernels: contract diagonal-realigned dense rows against the
# FULL-n interleaved table (resolution.full_legendre).  No parity split of
# the inputs (the 20+ ms stride-2 lane relayout at TCO1279), no separate
# recombination: north = sum_j d2[j] P[m+j], south = sum_j d2[j] (-1)^j
# P[m+j] (parity identity P(n, -mu) = (-1)^(n-m) P(n, mu)), with the sign
# applied to the small d2 operand in-kernel.  Table bytes and stream count
# are identical to the parity pair; MXU passes double (full-length dots
# for both hemispheres) — a good trade while the kernel is
# bandwidth-bound (<= 3-pass modes).
# ----------------------------------------------------------------------


def _inv_dense_kernel(d2_ref, pn_ref, n_ref, so_ref, *, mode):
    d2 = d2_ref[0]                # (fc2, J) realigned dense rows for m
    pn = pn_ref[0]                # (J, TILE_I) streamed full-n table tile
    J = d2.shape[-1]
    par = jax.lax.broadcasted_iota(jnp.int32, (1, J), 1) & 1
    sgn = (1 - 2 * par).astype(d2.dtype)
    fs = _dot(d2, pn, _DN_N, mode)
    fa = _dot(d2 * sgn, pn, _DN_N, mode)
    dt = n_ref.dtype
    n_ref[0] = fs.astype(dt)
    so_ref[0] = fa.astype(dt)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def group_inv_dense(d2, pn, mode="bf16x3", interpret=False):
    """One group's dense-row inverse LT: (gm, fc2, J) realigned rows x
    (gm, J, ig) full-n table -> (north, south) each (gm, fc2, ig);
    south NOT latitude-reversed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, fc2, J = d2.shape
    ig = pn.shape[2]
    ti = min(TILE_I, ig)
    grid = (gm, pl.cdiv(ig, ti))
    out = jax.ShapeDtypeStruct((gm, fc2, ig), d2.dtype)
    kern = functools.partial(_inv_dense_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, fc2, J), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, J, ti), lambda m, it: (m, 0, it)),
        ],
        out_specs=[
            pl.BlockSpec((1, fc2, ti), lambda m, it: (m, 0, it)),
            pl.BlockSpec((1, fc2, ti), lambda m, it: (m, 0, it)),
        ],
        out_shape=[out, out],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d2, pn)


def _dir_dense_kernel(fn_ref, fs_ref, pn_ref, o_ref, *, mode):
    from jax.experimental import pallas as pl

    fn = fn_ref[0]                # (fc2, ig) weighted north fourier
    fs = fs_ref[0]                # (fc2, ig) weighted south (NH-paired)
    pn = pn_ref[0]                # (TILE_J, ig)
    a = _dot(fn, pn, _DN_T, mode)
    b = _dot(fs, pn, _DN_T, mode)
    tj = a.shape[-1]
    j0 = pl.program_id(1) * tj
    par = (jax.lax.broadcasted_iota(jnp.int32, (1, tj), 1) + j0) & 1
    sgn = (1 - 2 * par).astype(a.dtype)
    o_ref[0] = (a + b * sgn).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def group_dir_dense(fn, fs, pn, mode="bf16x3", interpret=False):
    """One group's dense-row direct LT: weighted north/south fourier
    (gm, fc2, ig) x (gm, J, ig) table -> realigned rows (gm, fc2, J)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, fc2, ig = fn.shape
    J = pn.shape[1]
    tj = min(TILE_K, J)
    grid = (gm, pl.cdiv(J, tj))
    out = jax.ShapeDtypeStruct((gm, fc2, J), fn.dtype)
    kern = functools.partial(_dir_dense_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, fc2, ig), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, fc2, ig), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, tj, ig), lambda m, it: (m, it, 0)),
        ],
        out_specs=pl.BlockSpec((1, fc2, tj), lambda m, it: (m, 0, it)),
        out_shape=out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fn, fs, pn)


# ----------------------------------------------------------------------
# Hemisphere-packed dense-row kernels: the plain dense kernels issue TWO
# dots per table tile (north fs = d2 @ pn and south fa = (d2*sgn) @ pn for
# the inverse; a = fn @ pn^T and b = fs @ pn^T for the direct), each with
# only fc2 = 2*nfld <= ~32 of 128 MXU rows occupied.  Since both dots
# stream the SAME table tile, stacking the two small operands along the
# row axis ([d2 ; d2*sgn], 2*fc2 rows) turns them into ONE dot per tile —
# halving MXU tile-slot cost at identical table HBM traffic.  The stack is
# built OUTSIDE the kernel by XLA (the small operand, ~MBs) so the kernel
# body stays a single dot (the planes engine showed in-kernel row packing
# lowers pathologically on this backend).
# ----------------------------------------------------------------------


def _inv_dense2_kernel(d4_ref, pn_ref, o_ref, *, mode):
    d4 = d4_ref[0]                # (2*fc2, J): [d2 ; d2*sgn] pre-stacked
    pn = pn_ref[0]                # (J, TILE_I)
    o_ref[0] = _dot(d4, pn, _DN_N, mode).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def group_inv_dense2(d4, pn, mode="bf16x3", interpret=False):
    """Hemisphere-packed inverse: (gm, 2*fc2, J) stacked rows x
    (gm, J, ig) table -> (gm, 2*fc2, ig) with north in rows [:fc2] and
    south (NOT latitude-reversed) in rows [fc2:]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, fc4, J = d4.shape
    ig = pn.shape[2]
    ti = min(TILE_I, ig)
    grid = (gm, pl.cdiv(ig, ti))
    out = jax.ShapeDtypeStruct((gm, fc4, ig), d4.dtype)
    kern = functools.partial(_inv_dense2_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, fc4, J), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, J, ti), lambda m, it: (m, 0, it)),
        ],
        out_specs=pl.BlockSpec((1, fc4, ti), lambda m, it: (m, 0, it)),
        out_shape=out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d4, pn)


def _dir_dense2_kernel(f4_ref, pn_ref, o_ref, *, mode):
    f4 = f4_ref[0]                # (2*fc2, ig): [fn ; fs] pre-stacked
    pn = pn_ref[0]                # (TILE_J, ig)
    o_ref[0] = _dot(f4, pn, _DN_T, mode).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def group_dir_dense2(f4, pn, mode="bf16x3", interpret=False):
    """Hemisphere-packed direct: (gm, 2*fc2, ig) stacked weighted fourier
    x (gm, J, ig) table -> (gm, 2*fc2, J) raw dots; the caller combines
    rows a + b*sgn(j) into the realigned spectral rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gm, fc4, ig = f4.shape
    J = pn.shape[1]
    tj = min(TILE_K, J)
    grid = (gm, pl.cdiv(J, tj))
    out = jax.ShapeDtypeStruct((gm, fc4, J), f4.dtype)
    kern = functools.partial(_dir_dense2_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, fc4, ig), lambda m, it: (m, 0, 0)),
            pl.BlockSpec((1, tj, ig), lambda m, it: (m, it, 0)),
        ],
        out_specs=pl.BlockSpec((1, fc4, tj), lambda m, it: (m, 0, it)),
        out_shape=out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f4, pn)


def _pack2() -> bool:
    """Hemisphere-packed kernels on/off (ECTRANS_TPU_LEG_DENSE_PACK);
    default OFF until the round-5 on-chip A/B (tools/roofline.py) decides
    — flip the default with the measurement recorded here."""
    import os

    return os.environ.get("ECTRANS_TPU_LEG_DENSE_PACK", "0") != "0"


def _diag_realign(dense):
    """(nfld, 2, M, NP) -> (nfld, 2, M, NP+1) with d2[..., m, j] =
    dense[..., m, m+j]: a pure pad+reshape (index algebra m*(W+1) + j =
    m*W + (m+j)); entries past each row's diagonal end are neighbouring
    rows' data, annihilated by the zero-padded table columns."""
    f, c, M, W = dense.shape
    flat = dense.reshape(f, c, M * W)
    flat = jnp.pad(flat, [(0, 0), (0, 0), (0, M)])
    return flat.reshape(f, c, M, W + 1)


def _diag_unalign(d2, NP):
    """Inverse of _diag_realign: dense[..., m, n] = d2[..., m, n-m]
    (free flat reshape; entries at n < m are neighbouring rows' data —
    consumers mask or gather the valid region only)."""
    f, c, M, W1 = d2.shape
    flat = d2.reshape(f, c, M * W1)
    return flat[..., : M * NP].reshape(f, c, M, NP)


def _jsgn(J, dtype):
    """(1, 1, J) parity sign (+1 even j, -1 odd j)."""
    par = jax.lax.broadcasted_iota(jnp.int32, (1, 1, J), 2) & 1
    return (1 - 2 * par).astype(dtype)


def legendre_inv_dense(dense, fl, mode="bf16x3", interpret=False):
    """Dense-row inverse LT: (nfld, 2, M, NP) dense spectral ->
    (nfld, 2, M, ndgl) fourier north->south (fl: resolution.FullLegendre)."""
    nfld = dense.shape[0]
    d2 = _diag_realign(dense)
    pack2 = _pack2()
    parts = []
    for g in fl.groups:
        fc2 = 2 * nfld
        gm = g.m1 - g.m0
        dg = d2[:, :, g.m0:g.m1, :g.J].reshape(fc2, gm, g.J).swapaxes(0, 1)
        if pack2:
            d4 = jnp.concatenate([dg, dg * _jsgn(g.J, dg.dtype)], axis=1)
            d4 = jax.lax.optimization_barrier(d4)
            o = group_inv_dense2(d4, g.pn, mode=mode, interpret=interpret)
            north, south = o[:, :fc2], o[:, fc2:]
        else:
            north, south = group_inv_dense(dg, g.pn, mode=mode,
                                           interpret=interpret)
        north = north.swapaxes(0, 1).reshape(nfld, 2, gm, -1)
        south = south.swapaxes(0, 1).reshape(nfld, 2, gm, -1)[..., ::-1]
        pad = [(0, 0)] * 3
        parts.append(jnp.concatenate(
            [jnp.pad(north, pad + [(g.i0, 0)]),
             jnp.pad(south, pad + [(0, g.i0)])], axis=-1))
    return jnp.concatenate(parts, axis=2)


def legendre_dir_rows(fourier, fl, w, mode="bf16x3", interpret=False):
    """Dense-row direct LT emitting the kernels' NATIVE m-major layout:
    a list of per-group (gm, 2*nfld, J) realigned rows, sublane index
    c * nfld + f (c-major).  Skips the swapaxes/pad/concat/unalign that
    legendre_dir_dense pays to materialise the (nfld, 2, M, NP) dense
    tensor — the m-major packed pipeline consumes the rows directly."""
    nfld = fourier.shape[0]
    ndgnh = fl.ndgnh
    fc = fourier.swapaxes(0, 1)               # (2, nfld, M, ndgl): c-major
    north_all = fc[..., :ndgnh]
    south_all = fc[..., : ndgnh - 1 : -1]
    fn_all = north_all * w
    fs_all = south_all * w
    fn_all, fs_all = jax.lax.optimization_barrier((fn_all, fs_all))
    pack2 = _pack2()
    rows = []
    for g in fl.groups:
        fc2 = 2 * nfld
        gm = g.m1 - g.m0
        fn = fn_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        fs = fs_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        if pack2:
            f4 = jnp.concatenate([fn, fs], axis=1)
            raw = group_dir_dense2(f4, g.pn, mode=mode, interpret=interpret)
            rows.append(raw[:, :fc2] + raw[:, fc2:] * _jsgn(g.J, raw.dtype))
        else:
            rows.append(group_dir_dense(fn, fs, g.pn, mode=mode,
                                        interpret=interpret))
    return rows


def legendre_dir_dense(fourier, fl, w, NP, mode="bf16x3", interpret=False):
    """Dense-row direct LT: (nfld, 2, M, ndgl) fourier + NH weights ->
    (nfld, 2, M, NP) dense spectral rows (quadrature applied)."""
    nfld = fourier.shape[0]
    ndgnh = fl.ndgnh
    north_all = fourier[..., :ndgnh]
    south_all = fourier[..., : ndgnh - 1 : -1]
    fn_all = north_all * w
    fs_all = south_all * w
    fn_all, fs_all = jax.lax.optimization_barrier((fn_all, fs_all))
    pack2 = _pack2()
    W1 = NP + 1
    parts = []
    for g in fl.groups:
        fc2 = 2 * nfld
        gm = g.m1 - g.m0
        fn = fn_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        fs = fs_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        if pack2:
            f4 = jnp.concatenate([fn, fs], axis=1)
            raw = group_dir_dense2(f4, g.pn, mode=mode, interpret=interpret)
            d2g = raw[:, :fc2] + raw[:, fc2:] * _jsgn(g.J, raw.dtype)
        else:
            d2g = group_dir_dense(fn, fs, g.pn, mode=mode, interpret=interpret)
        d2g = d2g.swapaxes(0, 1).reshape(nfld, 2, gm, g.J)
        parts.append(jnp.pad(d2g, [(0, 0)] * 3 + [(0, W1 - g.J)]))
    d2 = jnp.concatenate(parts, axis=2)
    return _diag_unalign(d2, NP)


def legendre_inv_grouped(sym, asym, gl, mode="bf16x3", interpret=False):
    """Drop-in Pallas replacement of
    :func:`legendre_matmul.legendre_inv_grouped` (same contract: sym/asym
    (nfld, 2, M, kmax) -> fourier (nfld, 2, M, ndgl) north->south)."""
    nfld = sym.shape[0]
    parts = []
    for g in gl.groups:
        fc2 = 2 * nfld
        gm = g.m1 - g.m0
        s = sym[:, :, g.m0:g.m1, :g.kg].reshape(fc2, gm, g.kg).swapaxes(0, 1)
        a = asym[:, :, g.m0:g.m1, :g.kg].reshape(fc2, gm, g.kg).swapaxes(0, 1)
        north, south = group_inv(s, a, g.psym, g.pasym,
                                 mode=mode, interpret=interpret)
        north = north.swapaxes(0, 1).reshape(nfld, 2, gm, -1)
        south = south.swapaxes(0, 1).reshape(nfld, 2, gm, -1)[..., ::-1]
        pad = [(0, 0)] * 3
        parts.append(jnp.concatenate(
            [jnp.pad(north, pad + [(g.i0, 0)]),
             jnp.pad(south, pad + [(0, g.i0)])], axis=-1))
    return jnp.concatenate(parts, axis=2)


def legendre_dir_grouped(fourier, gl, w, mode="bf16x3", interpret=False):
    """Drop-in Pallas replacement of
    :func:`legendre_matmul.legendre_dir_grouped` (fourier (nfld, 2, M,
    ndgl) north->south + NH weights -> (sym, asym) (nfld, 2, M, kmax))."""
    nfld = fourier.shape[0]
    ndgnh, kmax = gl.ndgnh, gl.kmax
    north_all = fourier[..., :ndgnh]
    south_all = fourier[..., : ndgnh - 1 : -1]
    fsym_all = (north_all + south_all) * w
    fasym_all = (north_all - south_all) * w
    fsym_all, fasym_all = jax.lax.optimization_barrier((fsym_all, fasym_all))
    syms, asyms = [], []
    for g in gl.groups:
        fc2 = 2 * nfld
        gm = g.m1 - g.m0
        fs = fsym_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        fa = fasym_all[:, :, g.m0:g.m1, g.i0:].reshape(fc2, gm, -1).swapaxes(0, 1)
        s, a = group_dir(fs, fa, g.psym, g.pasym,
                         mode=mode, interpret=interpret)
        pad = [(0, 0)] * 3 + [(0, kmax - g.kg)]
        syms.append(jnp.pad(
            s.swapaxes(0, 1).reshape(nfld, 2, gm, g.kg), pad))
        asyms.append(jnp.pad(
            a.swapaxes(0, 1).reshape(nfld, 2, gm, g.kg), pad))
    return jnp.concatenate(syms, axis=2), jnp.concatenate(asyms, axis=2)
