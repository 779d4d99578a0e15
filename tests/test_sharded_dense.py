"""Sharded dense-row engine: the production single-device Pallas LT
(ops/legendre_pallas.py dense-row kernels) ported to the (w, v) mesh.

The reference runs ONE Legendre engine for every decomposition
(gpu/internal/leinv_mod.F90); before this port the sharded path was pinned
to the grouped-einsum formulation measured slower on-chip.  These tests
pin the port's correctness on the 8-virtual-CPU-device mesh (kernels in
interpret mode): the dense-engine sharded transforms must match the
xla-engine sharded transforms (identical tables, only the LT kernel and
the realigned-row plumbing differ) to LT-arithmetic tolerance, across
mesh shapes and flag combinations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ectrans_tpu as et
from ectrans_tpu.parallel import ShardedTransform, make_mesh


def _random_state(res, nuv, nsc, seed=0):
    rng = np.random.default_rng(seed)
    n0 = 2 * (res.nsmax + 1)

    def rp(n):
        x = rng.standard_normal((n, res.nspec2))
        x[:, 1:n0:2] = 0.0
        return x

    vor, div, sc = rp(nuv), rp(nuv), rp(nsc)
    if nuv:
        vor[:, 0] = 0.0
        div[:, 0] = 0.0
    return vor, div, sc


def _dense_st(res, w, v, monkeypatch, precision="highest"):
    monkeypatch.setenv("ECTRANS_TPU_LEG_KERNEL", "dense")
    st = ShardedTransform(res, make_mesh(w, v), dtype=jnp.float32,
                          precision=precision)
    assert st.eng == "dense"
    assert any(k.startswith("fl") for k in st.tables)
    return st


def _xla_st(res, w, v, monkeypatch):
    monkeypatch.setenv("ECTRANS_TPU_LEG_KERNEL", "xla")
    return ShardedTransform(res, make_mesh(w, v), dtype=jnp.float32)


# bf16x6 kernel arithmetic vs fp32 HIGHEST einsum: both carry the full
# fp32 mantissa; residual differences are rounding-path noise well under
# the reference's 100*eps fp32 gate.
TOL = 100 * np.finfo(np.float32).eps


@pytest.mark.parametrize("w,v", [(2, 1), (4, 2), (1, 2)])
def test_sharded_dense_inv_matches_xla(w, v, monkeypatch):
    res = et.setup("O48", 47)
    vor, div, sc = _random_state(res, 2, 3)
    flags = et.InvFlags(vorgp=True, divgp=True, scders=True, uvders=True)
    ref = np.asarray(_xla_st(res, w, v, monkeypatch).inv_trans(
        spvor=jnp.asarray(vor), spdiv=jnp.asarray(div),
        spscalar=jnp.asarray(sc), flags=flags))
    got = np.asarray(_dense_st(res, w, v, monkeypatch).inv_trans(
        spvor=jnp.asarray(vor), spdiv=jnp.asarray(div),
        spscalar=jnp.asarray(sc), flags=flags))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < TOL, f"(w={w},v={v}) dense-vs-xla inv mismatch {err}"


@pytest.mark.parametrize("w,v", [(2, 1), (4, 2)])
def test_sharded_dense_dir_matches_xla(w, v, monkeypatch):
    res = et.setup("O48", 47)
    rng = np.random.default_rng(1)
    u = rng.standard_normal((3, res.ndgl, res.grid.ndlon)).astype(np.float32)
    vv = rng.standard_normal((3, res.ndgl, res.grid.ndlon)).astype(np.float32)
    sc = rng.standard_normal((2, res.ndgl, res.grid.ndlon)).astype(np.float32)
    ref = _xla_st(res, w, v, monkeypatch).dir_trans(
        u=jnp.asarray(u), v=jnp.asarray(vv), scalars=jnp.asarray(sc))
    got = _dense_st(res, w, v, monkeypatch).dir_trans(
        u=jnp.asarray(u), v=jnp.asarray(vv), scalars=jnp.asarray(sc))
    for name, r, g in zip(("vor", "div", "sc"), ref, got):
        r, g = np.asarray(r), np.asarray(g)
        err = np.abs(g - r).max() / np.abs(r).max()
        assert err < TOL, f"(w={w},v={v}) dense-vs-xla {name} mismatch {err}"


def test_sharded_dense_scalar_only_and_uv_only(monkeypatch):
    """Field-family branches (no uv / no sc) through the realigned plumbing."""
    res = et.setup("O48", 47)
    vor, div, sc = _random_state(res, 2, 3, seed=5)
    st_d = _dense_st(res, 2, 2, monkeypatch)
    st_x = _xla_st(res, 2, 2, monkeypatch)
    g_d = np.asarray(st_d.inv_trans(spscalar=jnp.asarray(sc)))
    g_x = np.asarray(st_x.inv_trans(spscalar=jnp.asarray(sc)))
    assert np.abs(g_d - g_x).max() / np.abs(g_x).max() < TOL
    g_d = np.asarray(st_d.inv_trans(spvor=jnp.asarray(vor),
                                    spdiv=jnp.asarray(div)))
    g_x = np.asarray(st_x.inv_trans(spvor=jnp.asarray(vor),
                                    spdiv=jnp.asarray(div)))
    assert np.abs(g_d - g_x).max() / np.abs(g_x).max() < TOL


def test_sharded_dense_roundtrip(monkeypatch):
    """fp32 round trip through the dense sharded engine at the reference
    single-precision tolerance (the same gate as the xla-path test)."""
    res = et.setup("O48", 47)
    vor, div, sc = _random_state(res, 2, 3, seed=2)
    st = _dense_st(res, 4, 2, monkeypatch)
    grid = st.inv_trans(spvor=jnp.asarray(vor), spdiv=jnp.asarray(div),
                        spscalar=jnp.asarray(sc))
    u, vv, s = grid[0:2], grid[2:4], grid[4:7]
    sv, sd, ss = st.dir_trans(u=u, v=vv, scalars=s)
    assert np.abs(np.asarray(sv) - vor).max() < 2e-5
    assert np.abs(np.asarray(sd) - div).max() < 2e-5
    assert np.abs(np.asarray(ss) - sc).max() < 2e-5


def test_sharded_dense_bf16_tier(monkeypatch):
    """bf16 tier on the dense engine: half-size fl tables + single-pass
    kernels inside the reference's relaxed FLT gate (1e6*eps)."""
    res = et.setup("O48", 47)
    _, _, sc = _random_state(res, 0, 3, seed=6)
    st = _dense_st(res, 4, 2, monkeypatch, precision="bf16")
    assert str(st.tables["fl0_pn_w"].dtype) == "bfloat16"
    grid = st.inv_trans(spscalar=jnp.asarray(sc))
    _, _, ss = st.dir_trans(scalars=grid)
    scale = np.abs(sc).max()
    err = np.abs(np.asarray(ss) - sc).max()
    assert err < 1e6 * np.finfo(np.float32).eps * scale, err


def test_sharded_dense_fp64_falls_back_to_xla(monkeypatch):
    """fp64 cannot ride the bf16-pass kernels: the engine dispatch must
    keep true-fp64 einsums (same rule as the single-device path)."""
    monkeypatch.setenv("ECTRANS_TPU_LEG_KERNEL", "dense")
    res = et.setup("F24", 23)
    st = ShardedTransform(res, make_mesh(2, 2), dtype=jnp.float64)
    assert st.eng == "xla"
    assert not any(k.startswith("fl") for k in st.tables)
