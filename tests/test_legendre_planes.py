"""Plane-split Legendre engine (legendre_planes): interpret-mode
equivalence with the XLA parity-split formulation, limb-split exactness,
and the full-transform equivalence when ECTRANS_TPU_LEG_KERNEL=planes.

The limb split is bitwise (mantissa masking) specifically because XLA's
excess-precision simplification folds round-trip bf16 casts inside larger
programs (measured on the TPU backend); test_split_planes_exact pins the
reconstruction so any regression to cast-based splitting is caught on CPU.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ectrans_tpu as et
from ectrans_tpu.ops import legendre_matmul, legendre_planes as lp
from ectrans_tpu.transform import InvFlags


@pytest.fixture(scope="module")
def res():
    return et.setup("O48", 47)


def test_split_planes_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate([
        rng.standard_normal(500),
        10.0 ** rng.uniform(-30, 3, 500) * np.sign(rng.standard_normal(500)),
        [0.0, 1.0, -1.0],
    ]), jnp.float32)
    planes = lp.split_planes(x, 3)
    rec = sum(p.astype(jnp.float32) for p in planes)
    rel = np.abs(np.asarray(rec - x)) / np.maximum(np.abs(np.asarray(x)), 1e-38)
    assert rel.max() < 2 ** -23, rel.max()
    # single-plane split == plain bf16 rounding to within 1 ulp(bf16)
    one = lp.split_planes(x, 1)[0].astype(jnp.float32)
    rel1 = np.abs(np.asarray(one - x)) / np.maximum(np.abs(np.asarray(x)), 1e-38)
    assert rel1.max() < 2 ** -7.5, rel1.max()


def test_inv_planes_matches_parity(res):
    gl = res.grouped_legendre("float32")
    ppl = res.planes_legendre(3)
    rng = np.random.default_rng(0)
    nfld = 3
    dense = jnp.asarray(
        rng.standard_normal((nfld, 2, res.M, res.NP)), jnp.float32)
    dense = dense * res.device_tables(jnp.float32).dense_valid
    from ectrans_tpu.ops import layout

    sym, asym = layout.dense_to_parity(dense, res.device_tables(jnp.float32))
    ref = np.asarray(legendre_matmul.legendre_inv_grouped(
        sym, asym, gl, precision=jax.lax.Precision.HIGHEST))
    got = np.asarray(lp.legendre_inv_planes(dense, ppl, 3, interpret=True))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 5e-6, err


def test_dir_planes_matches_parity(res):
    gl = res.grouped_legendre("float32")
    ppl = res.planes_legendre(3)
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
    got = np.asarray(lp.legendre_dir_planes(four, ppl, w, res.NP, 3,
                                            interpret=True))
    valid = np.asarray(tables.dense_valid) > 0
    diff = np.abs(got - ref) * valid
    err = diff.max() / np.abs(ref * valid).max()
    assert err < 5e-6, err


def test_dir_rows_planes_matches_dense_rows(res):
    """The m-major rows contract must be identical between engines (it
    feeds the packed-compaction kernel unchanged)."""
    from ectrans_tpu.ops import legendre_pallas

    fl = res.full_legendre("float32")
    ppl = res.planes_legendre(3)
    tables = res.device_tables(jnp.float32)
    rng = np.random.default_rng(3)
    nfld = 2
    four = jnp.asarray(
        rng.standard_normal((nfld, 2, res.M, res.ndgl)), jnp.float32)
    w = tables.w[: res.ndgnh]
    rows_ref = legendre_pallas.legendre_dir_rows(four, fl, w, mode="f32",
                                                 interpret=True)
    rows_got = lp.legendre_dir_rows_planes(four, ppl, w, 3, interpret=True)
    assert len(rows_ref) == len(rows_got)
    for a, b in zip(rows_ref, rows_got):
        assert a.shape == b.shape
        err = float(jnp.max(jnp.abs(a - b))) / float(jnp.max(jnp.abs(a)))
        assert err < 5e-6, err


def test_full_transform_planes_engine(res):
    """inv+dir round trip through the planes engine == the XLA engine,
    including the packed-compaction output path."""
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
    oldpk = os.environ.get("ECTRANS_TPU_PACK_KERNEL")
    try:
        os.environ["ECTRANS_TPU_LEG_KERNEL"] = "xla"
        g_ref = np.asarray(et.inv_trans(
            res, spvor=spvor, spdiv=spdiv, spscalar=spsc, flags=flags))
        os.environ["ECTRANS_TPU_LEG_KERNEL"] = "planes"
        g_pl = np.asarray(et.inv_trans(
            res, spvor=spvor, spdiv=spdiv, spscalar=spsc, flags=flags))
        assert np.abs(g_pl - g_ref).max() < 5e-5 * np.abs(g_ref).max()

        u = jnp.asarray(g_ref[0:nuv])
        v = jnp.asarray(g_ref[nuv : 2 * nuv])
        sc = jnp.asarray(g_ref[2 * nuv : 2 * nuv + nsc])
        os.environ["ECTRANS_TPU_LEG_KERNEL"] = "xla"
        vr, dr, sr = (np.asarray(x)
                      for x in et.dir_trans(res, u=u, v=v, scalars=sc))
        os.environ["ECTRANS_TPU_LEG_KERNEL"] = "planes"
        os.environ["ECTRANS_TPU_PACK_KERNEL"] = "force"  # interpret pack
        vd, dd, sd = (np.asarray(x)
                      for x in et.dir_trans(res, u=u, v=v, scalars=sc))
        for a, b in ((vr, vd), (dr, dd), (sr, sd)):
            assert np.abs(a - b).max() < 5e-5 * np.abs(a).max()
    finally:
        for k, v in (("ECTRANS_TPU_LEG_KERNEL", old),
                     ("ECTRANS_TPU_PACK_KERNEL", oldpk)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_bf16_tier_planes(res):
    """nplanes=1 == the bf16 precision tier: single-plane accuracy at the
    reference's relaxed FLT gate precedent (1e6*eps)."""
    gl = res.grouped_legendre("float32")
    ppl = res.planes_legendre(1)
    rng = np.random.default_rng(4)
    dense = jnp.asarray(
        rng.standard_normal((2, 2, res.M, res.NP)), jnp.float32)
    dense = dense * res.device_tables(jnp.float32).dense_valid
    from ectrans_tpu.ops import layout

    sym, asym = layout.dense_to_parity(dense, res.device_tables(jnp.float32))
    ref = np.asarray(legendre_matmul.legendre_inv_grouped(
        sym, asym, gl, precision=jax.lax.Precision.HIGHEST))
    got = np.asarray(lp.legendre_inv_planes(dense, ppl, 1, interpret=True))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert 1e-5 < err < 3e-2, err
