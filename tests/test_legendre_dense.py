"""Dense-row Legendre engine (legendre_pallas.group_inv_dense/_dir_dense):
interpret-mode equivalence with the XLA parity-split formulation, and the
full-transform equivalence when ECTRANS_TPU_LEG_KERNEL=dense."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ectrans_tpu as et
from ectrans_tpu.ops import legendre_matmul, legendre_pallas
from ectrans_tpu.transform import InvFlags


@pytest.fixture(scope="module")
def res():
    return et.setup("O48", 47)


def test_inv_dense_matches_parity(res):
    gl = res.grouped_legendre("float32")
    fl = res.full_legendre("float32")
    rng = np.random.default_rng(0)
    nfld = 3
    dense = jnp.asarray(
        rng.standard_normal((nfld, 2, res.M, res.NP)), jnp.float32)
    dense = dense * res.device_tables(jnp.float32).dense_valid
    from ectrans_tpu.ops import layout

    sym, asym = layout.dense_to_parity(dense, res.device_tables(jnp.float32))
    ref = np.asarray(legendre_matmul.legendre_inv_grouped(
        sym, asym, gl, precision=jax.lax.Precision.HIGHEST))
    got = np.asarray(legendre_pallas.legendre_inv_dense(
        dense, fl, mode="f32", interpret=True))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 5e-6, err


def test_dir_dense_matches_parity(res):
    gl = res.grouped_legendre("float32")
    fl = res.full_legendre("float32")
    tables = res.device_tables(jnp.float32)
    rng = np.random.default_rng(1)
    nfld = 2
    four = jnp.asarray(
        rng.standard_normal((nfld, 2, res.M, res.ndgl)), jnp.float32)
    w = tables.w[: res.ndgnh]
    from ectrans_tpu.ops import layout

    sym, asym = legendre_matmul.legendre_dir_grouped(
        four, gl, w, precision=jax.lax.Precision.HIGHEST)
    ref = np.asarray(layout.parity_to_dense(sym, asym, tables, res.NP))
    got = np.asarray(legendre_pallas.legendre_dir_dense(
        four, fl, w, res.NP, mode="f32", interpret=True))
    # compare on the valid region only (n >= m): both layouts carry
    # neighbouring rows' data below the diagonal
    valid = np.asarray(tables.dense_valid) > 0
    diff = np.abs(got - ref) * valid
    err = diff.max() / np.abs(ref * valid).max()
    assert err < 5e-6, err


def test_full_transform_dense_engine(res):
    """inv+dir round trip through the dense engine == the XLA engine."""
    rng = np.random.default_rng(2)
    nuv, nsc = 2, 3
    flags = InvFlags(scders=True, uvders=True)

    def packed(n):
        x = rng.standard_normal((n, res.nspec2)).astype(np.float32)
        x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
        x[:, 0] = 0.0
        return jnp.asarray(x)

    spvor, spdiv, spsc = packed(nuv), packed(nuv), packed(nsc)
    old = os.environ.get("ECTRANS_TPU_LEG_KERNEL")
    try:
        os.environ["ECTRANS_TPU_LEG_KERNEL"] = "xla"
        g_ref = np.asarray(et.inv_trans(
            res, spvor=spvor, spdiv=spdiv, spscalar=spsc, flags=flags))
        os.environ["ECTRANS_TPU_LEG_KERNEL"] = "dense"
        g_dense = np.asarray(et.inv_trans(
            res, spvor=spvor, spdiv=spdiv, spscalar=spsc, flags=flags))
        assert np.abs(g_dense - g_ref).max() < 5e-5 * np.abs(g_ref).max()

        u = jnp.asarray(g_ref[0:nuv])
        v = jnp.asarray(g_ref[nuv : 2 * nuv])
        sc = jnp.asarray(g_ref[2 * nuv : 2 * nuv + nsc])
        os.environ["ECTRANS_TPU_LEG_KERNEL"] = "xla"
        vr, dr, sr = (np.asarray(x)
                      for x in et.dir_trans(res, u=u, v=v, scalars=sc))
        os.environ["ECTRANS_TPU_LEG_KERNEL"] = "dense"
        vd, dd, sd = (np.asarray(x)
                      for x in et.dir_trans(res, u=u, v=v, scalars=sc))
        for a, b in ((vr, vd), (dr, dd), (sr, sd)):
            assert np.abs(a - b).max() < 5e-5 * np.abs(a).max()
    finally:
        if old is None:
            os.environ.pop("ECTRANS_TPU_LEG_KERNEL", None)
        else:
            os.environ["ECTRANS_TPU_LEG_KERNEL"] = old


@pytest.mark.parametrize("direction", ["inv", "dir"])
def test_hemisphere_packed_equivalence(res, direction):
    """The hemisphere-packed kernels (one dot per table tile,
    ECTRANS_TPU_LEG_DENSE_PACK=1) match the two-dot dense kernels."""
    fl = res.full_legendre("float32")
    tables = res.device_tables(jnp.float32)
    rng = np.random.default_rng(7)
    nfld = 3
    old = os.environ.get("ECTRANS_TPU_LEG_DENSE_PACK")
    try:
        if direction == "inv":
            dense = jnp.asarray(
                rng.standard_normal((nfld, 2, res.M, res.NP)), jnp.float32)
            dense = dense * tables.dense_valid
            os.environ["ECTRANS_TPU_LEG_DENSE_PACK"] = "0"
            ref = np.asarray(legendre_pallas.legendre_inv_dense(
                dense, fl, mode="f32", interpret=True))
            os.environ["ECTRANS_TPU_LEG_DENSE_PACK"] = "1"
            got = np.asarray(legendre_pallas.legendre_inv_dense(
                dense, fl, mode="f32", interpret=True))
        else:
            four = jnp.asarray(
                rng.standard_normal((nfld, 2, res.M, res.ndgl)), jnp.float32)
            w = tables.w[: res.ndgnh]
            os.environ["ECTRANS_TPU_LEG_DENSE_PACK"] = "0"
            ref = np.asarray(legendre_pallas.legendre_dir_dense(
                four, fl, w, res.NP, mode="f32", interpret=True))
            rows_ref = [np.asarray(r) for r in legendre_pallas.legendre_dir_rows(
                four, fl, w, mode="f32", interpret=True)]
            os.environ["ECTRANS_TPU_LEG_DENSE_PACK"] = "1"
            got = np.asarray(legendre_pallas.legendre_dir_dense(
                four, fl, w, res.NP, mode="f32", interpret=True))
            rows_got = [np.asarray(r) for r in legendre_pallas.legendre_dir_rows(
                four, fl, w, mode="f32", interpret=True)]
            for a, b in zip(rows_ref, rows_got):
                assert np.abs(a - b).max() < 1e-5 * max(np.abs(a).max(), 1.0)
        assert np.abs(got - ref).max() < 1e-5 * max(np.abs(ref).max(), 1.0)
    finally:
        if old is None:
            os.environ.pop("ECTRANS_TPU_LEG_DENSE_PACK", None)
        else:
            os.environ["ECTRANS_TPU_LEG_DENSE_PACK"] = old
