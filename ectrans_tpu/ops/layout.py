"""Spectral-layout conversions (packed NASM0 <-> dense (c, m, n) <-> parity).

The packed layout is the ecTrans user layout (``suwavedi_mod.F90`` NASM0
addressing, reproduced in ``resolution._build_packed_maps``); the dense and
parity layouts are internal, zero-padded, static-shape tensors that XLA maps
onto the MXU.  All conversions are gathers with precomputed index tables —
the TPU-native replacement of PRFI1B/UPDSP's per-m copy loops
(``prfi1b_mod.F90``, ``updsp_mod.F90``).
"""

from __future__ import annotations

import jax.numpy as jnp


def packed_to_dense(spec, tables):
    """(nfld, nspec2) -> (nfld, 2, M, NP) dense absolute-n layout."""
    nfld = spec.shape[0]
    padded = jnp.concatenate(
        [spec, jnp.zeros((nfld, 1), dtype=spec.dtype)], axis=-1
    )
    # dense_gather: (2, M, NP) indices into padded last axis
    return padded[:, tables.dense_gather]


def dense_to_packed(dense, tables):
    """(nfld, 2, M, NP) -> (nfld, nspec2)."""
    return dense[:, tables.packed_gather_c, tables.packed_gather_m, tables.packed_gather_n]


def dense_to_parity(dense, tables):
    """(nfld, 2, M, NP) -> sym, asym each (nfld, 2, M, K).

    Gathers n = m+2k (sym) / n = m+1+2k (asym); index NP selects an appended
    zero row (padding).
    """
    M = dense.shape[2]
    pad = jnp.concatenate(
        [dense, jnp.zeros(dense.shape[:3] + (1,), dtype=dense.dtype)], axis=-1
    )
    marange = jnp.arange(M)[:, None]
    sym = pad[:, :, marange, tables.idx_sym]
    asym = pad[:, :, marange, tables.idx_asym]
    return sym, asym


def parity_to_dense(sym, asym, tables, NP):
    """Scatter parity coefficients back to the dense layout (exact inverse of
    dense_to_parity on the valid region; padding rows land in a dropped slot)."""
    nfld, two, M, K = sym.shape
    dense = jnp.zeros((nfld, two, M, NP + 1), dtype=sym.dtype)
    marange = jnp.arange(M)[:, None]
    dense = dense.at[:, :, marange, tables.idx_sym].add(sym)
    dense = dense.at[:, :, marange, tables.idx_asym].add(asym)
    return dense[..., :NP]
