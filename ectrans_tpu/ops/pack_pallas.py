"""Pallas packed-layout compaction (m-major dense rows -> NASM0 packed).

The direct transform must emit the ecTrans user spectral layout — per-m
contiguous blocks of interleaved (re, im) coefficients at offsets NASM0
(``suwavedi_mod.F90``; reference UPDSP scatters per m,
``updsp_mod.F90``).  The XLA formulation is a per-element gather over
(c, m, n) index tables (``layout.dense_to_packed``), measured ~30 ms per
10-field TCO1279 round trip (~2 GB/s effective) because XLA's TPU gather
lowering fetches element-by-element; reformulations with monotone
unit-stride gathers measured SLOWER (see layout.py).

This kernel instead walks the packed layout tile-by-tile in one
sequential grid (the megablox-style scalar-prefetch pattern): each step
owns one (m, output-tile) pair, keeps the current m's realigned dense row
VMEM-resident (fetched once per m), interleaves the (re, im) planes into
packed order with in-VMEM shuffles, rotates to the tile's unaligned
offset, and merges into the output tile with a validity mask.
Consecutive steps that share an output tile revisit the same block, so
Pallas keeps it in VMEM and flushes it exactly once — no read-modify-write
traffic to HBM.  Total HBM traffic is one read of the rows + one write of
the packed array (~3 ms at TCO1279 vs 30 ms for the gather).

Input rows are c-major m-major: row[m][c * nfld + f, j] = coefficient
(field f, re/im c, wavenumber m, degree n = m + j) — the native output
layout of the dense-row direct LT kernels (``legendre_pallas``), so the
direct transform never materialises the (nfld, 2, M, NP) dense tensor on
the packed path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

TILE = 512          # packed positions per output tile (lane extent)


def _compact_kernel(rowm_ref, otile_ref, qoff_ref, lm2_ref, jsr_ref,
                    d2_ref, out_ref, *, nfld, tile):
    """One step: merge row `rowm[s]`'s slice into packed tile `otile[s]`.

    q = packed position - NASM0-offset of this m; lane l of the tile holds
    q = qoff + l.  Valid lanes satisfy 0 <= q < 2*L_m; their value is the
    interleaved stream[q] = row[(q&1)*nfld + f, q>>1].  Both qoff and the
    tile base are even, so lane 2r+c maps to j = qoff/2 + r exactly — the
    row slice at jsr = qoff/2 + R (rows are zero-padded by R slots on both
    ends, keeping every slice in bounds) lines up with the tile without
    any rotate."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    sid = pl.program_id(0)
    qoff = qoff_ref[sid]
    lm2 = lm2_ref[sid]
    R = tile // 2
    row = d2_ref[0]                   # (2*nfld, Jrow) VMEM-resident per m
    # Mosaic only allows 128-aligned dynamic lane slices; a dynamic lane
    # ROTATE is supported, so rotate the whole row and take a static
    # slice.  The shift must be NON-NEGATIVE: tpu.dynamic_rotate treats a
    # negative shift as a huge unsigned one (measured wrong results on
    # chip; interpret mode accepts either sign), so pass the congruent
    # row_len - jsr instead of -jsr.
    rolled = pltpu.roll(row, row.shape[-1] - jsr_ref[sid], 1)
    seg = rolled[:, :R]
    a = seg[:nfld]                                    # re plane (c-major)
    b = seg[nfld:]
    # (re, im) lane interleave as a one-hot selector matmul: Mosaic lowers
    # neither (f, R, 2)->(f, 2R) shape casts, interior pads, nor strided
    # stores on this backend, but a 0/1 dot at HIGHEST precision is exact
    # (measured bit-exact) and one MXU pass
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, tile), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (R, tile), 1)
    f32 = jnp.float32
    ea = (l_iota == 2 * r_iota).astype(f32)
    eb = (l_iota == 2 * r_iota + 1).astype(f32)
    dn = (((1,), (0,)), ((), ()))
    hi = jax.lax.Precision.HIGHEST
    inter = (jax.lax.dot_general(a.astype(f32), ea, dn, precision=hi)
             + jax.lax.dot_general(b.astype(f32), eb, dn, precision=hi))
    q = qoff + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    valid = (q >= 0) & (q < lm2)
    out_ref[...] = jnp.where(valid, inter.astype(out_ref.dtype),
                             out_ref[...])


@functools.partial(jax.jit,
                   static_argnames=("nfld", "tile", "seglen", "interpret"))
def _compact_group(d2rows, rowm, otile, qoff, lm2, jsr, *, nfld, tile,
                   seglen, interpret=False):
    """Compact one m-group: rows (gm, 2*nfld, R+Jpad+R) -> (nfld, seglen).

    Rows must be zero-padded by R = tile//2 slots on both lane ends (the
    plan's jsr indices assume it)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = rowm.shape[0]
    kern = functools.partial(_compact_kernel, nfld=nfld, tile=tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1,) + d2rows.shape[1:],
                         lambda s, rowm, *_: (rowm[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (nfld, tile), lambda s, rowm, otile, *_: (0, otile[s])),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nfld, seglen), d2rows.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rowm, otile, qoff, lm2, jsr, d2rows)


@dataclasses.dataclass(frozen=True)
class _GroupPlan:
    m0: int
    m1: int
    Jpad: int       # row extent fed to the kernel EXCLUDING the 2R pad
    seglen: int
    rowm: Any       # (S,) int32 local row index
    otile: Any      # (S,) int32 output tile index within the segment
    qoff: Any       # (S,) int32 tile_base - block_offset (may be negative)
    lm2: Any        # (S,) int32 2 * (nsmax + 1 - m)
    jsr: Any        # (S,) int32 input slice start (= qoff/2 + R, in-bounds)


@dataclasses.dataclass(frozen=True)
class PackPlan:
    tile: int
    groups: tuple


def _register():
    jax.tree_util.register_dataclass(
        _GroupPlan,
        data_fields=["rowm", "otile", "qoff", "lm2", "jsr"],
        meta_fields=["m0", "m1", "Jpad", "seglen"],
    )
    jax.tree_util.register_dataclass(
        PackPlan, data_fields=["groups"], meta_fields=["tile"])


_register()


@functools.lru_cache(maxsize=8)
def plan_for(res, ngroups_key=None, tile: int = TILE) -> PackPlan:
    """Host-built step plan for a resolution's full_legendre group
    structure (group boundaries only depend on (M, ngroups))."""
    M, nsmax = res.M, res.nsmax
    nasm0 = np.asarray(res.nasm0, np.int64)
    nspec2 = res.nspec2
    ngroups = ngroups_key or _default_ngroups(M)
    bs = -(-M // ngroups)
    R = tile // 2
    groups = []
    for gi in range(ngroups):
        m0 = gi * bs
        m1 = min(M, m0 + bs)
        if m0 >= M:
            break
        kg = (nsmax + 1 - m0) // 2 + 1
        J = 2 * kg
        seg0 = int(nasm0[m0])
        segend = int(nasm0[m1]) if m1 < M else nspec2
        seglen = segend - seg0
        rowm, otile, qoff, lm2, jsr = [], [], [], [], []
        for m in range(m0, m1):
            off = int(nasm0[m]) - seg0
            L2 = 2 * (nsmax + 1 - m)
            t0, t1 = off // tile, (off + L2 - 1) // tile
            for t in range(t0, t1 + 1):
                rowm.append(m - m0)
                otile.append(t)
                qo = t * tile - off      # even: nasm0 and tile bases are even
                qoff.append(qo)
                lm2.append(L2)
                jsr.append(qo // 2 + R)  # in [1, J+R): in-bounds with 2R pad
        i32 = lambda x: jnp.asarray(np.asarray(x, np.int32))
        groups.append(_GroupPlan(
            m0=m0, m1=m1, Jpad=J, seglen=seglen, rowm=i32(rowm),
            otile=i32(otile), qoff=i32(qoff), lm2=i32(lm2), jsr=i32(jsr)))
    return PackPlan(tile=tile, groups=tuple(groups))


def _default_ngroups(M: int) -> int:
    import os

    env = os.environ.get("ECTRANS_TPU_LEG_GROUPS")
    return int(env) if env else max(1, min(16, M // 8))


def supported() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def dense_to_packed(dense, plan: PackPlan, interpret=None):
    """(nfld, 2, M, NP) dense -> (nfld, nspec2) packed via the compaction
    kernel (drop-in for ``layout.dense_to_packed``).

    The diagonal realignment is a free reshape; the c-major m-major
    permutation is one lane-preserving transpose (cheap next to the 30 ms
    element gather this replaces)."""
    f, c2, M, W = dense.shape
    flat = dense.reshape(f, c2, M * W)
    flat = jnp.pad(flat, [(0, 0), (0, 0), (0, M)])
    d2 = flat.reshape(f, c2, M, W + 1)       # d2[..., m, j] = dense[m, m+j]
    mm = d2.transpose(2, 1, 0, 3).reshape(M, 2 * f, W + 1)
    return packed_from_mmajor(mm, plan, interpret=interpret)


def groups_match(plan: PackPlan, fl) -> bool:
    """True when the plan's m-groups coincide with a FullLegendre's (the
    per-group pipeline feeds kernel rows straight into compaction)."""
    return (len(plan.groups) == len(fl.groups)
            and all(gp.m0 == g.m0 and gp.m1 == g.m1
                    for gp, g in zip(plan.groups, fl.groups)))


def packed_from_group_rows(rows_list, plan: PackPlan, interpret=None):
    """Per-group c-major m-major realigned rows [(gm, 2*nfld, Jg), ...]
    (one entry per plan group) -> packed (nfld, nspec2)."""
    if interpret is None:
        interpret = not supported()
    R = plan.tile // 2
    segs = []
    for rows, gp in zip(rows_list, plan.groups):
        nfld = rows.shape[1] // 2
        take = min(gp.Jpad, rows.shape[2])
        total = -(-(R + gp.Jpad + R) // 128) * 128
        segs.append(_compact_group(
            jnp.pad(rows[:, :, :take],
                    [(0, 0), (0, 0), (R, total - R - take)]),
            gp.rowm, gp.otile, gp.qoff, gp.lm2, gp.jsr,
            nfld=nfld, tile=plan.tile, seglen=gp.seglen,
            interpret=interpret))
    return jnp.concatenate(segs, axis=1)


def packed_from_mmajor(mm, plan: PackPlan, interpret=None):
    """m-major c-major realigned rows (M, 2*nfld, W1) -> packed
    (nfld, nspec2).  Rows may carry neighbouring-row garbage beyond each
    row's valid length (diagonal realignment); the kernel's validity mask
    never reads it."""
    if interpret is None:
        interpret = not supported()
    M, fc2, W1 = mm.shape
    nfld = fc2 // 2
    R = plan.tile // 2
    segs = []
    for gp in plan.groups:
        take = min(gp.Jpad, W1)
        rows = mm[gp.m0 : gp.m1, :, :take]
        # lane extent must be 128-aligned (tpu.dynamic_rotate rejects
        # unaligned vectors); zero-pad R on the left (jsr >= 1 - R) and at
        # least R on the right, rounded up
        total = -(-(R + gp.Jpad + R) // 128) * 128
        segs.append(_compact_group(
            jnp.pad(rows, [(0, 0), (0, 0), (R, total - R - take)]),
            gp.rowm, gp.otile, gp.qoff, gp.lm2, gp.jsr,
            nfld=nfld, tile=plan.tile, seglen=gp.seglen,
            interpret=interpret))
    return jnp.concatenate(segs, axis=1)
