"""Pallas grouped Legendre kernels vs the XLA einsum reference path.

Runs in interpret mode on the CPU test backend; the real-TPU numerics are
additionally covered by tools/tpu_selftest.py and the bench gate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import ectrans_tpu as et
from ectrans_tpu.ops import legendre_matmul, legendre_pallas


@pytest.fixture(scope="module")
def res():
    return et.setup("O48", 47)


def _coeffs(res, nfld, seed=0):
    rng = np.random.default_rng(seed)
    shape = (nfld, 2, res.M, res.kmax)
    return (jnp.asarray(rng.standard_normal(shape), jnp.float32),
            jnp.asarray(rng.standard_normal(shape), jnp.float32))


def test_inv_matches_einsum(res):
    gl = res.grouped_legendre("float32")
    sym, asym = _coeffs(res, 5)
    ref = legendre_matmul.legendre_inv_grouped(sym, asym, gl)
    out = legendre_pallas.legendre_inv_grouped(
        sym, asym, gl, mode="f32", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dir_matches_einsum(res):
    gl = res.grouped_legendre("float32")
    w = jnp.asarray(res.w[: res.ndgnh], jnp.float32)
    rng = np.random.default_rng(1)
    four = jnp.asarray(
        rng.standard_normal((3, 2, res.M, res.ndgl)), jnp.float32)
    rs, ra = legendre_matmul.legendre_dir_grouped(four, gl, w)
    s, a = legendre_pallas.legendre_dir_grouped(
        four, gl, w, mode="f32", interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ra),
                               rtol=1e-5, atol=1e-6)


def test_bf16x3_accuracy(res):
    """The 3-pass bf16 split stays well inside the reference's 100*eps
    gate (the XLA HIGHEST path is the ground truth here)."""
    gl = res.grouped_legendre("float32")
    sym, asym = _coeffs(res, 2, seed=2)
    ref = legendre_matmul.legendre_inv_grouped(sym, asym, gl)
    out = legendre_pallas.legendre_inv_grouped(
        sym, asym, gl, mode="bf16x3", interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 20 * np.finfo(np.float32).eps * scale * np.sqrt(res.kmax)


def test_bf16_mode_runs(res):
    """Single-pass bf16 mode: relaxed gate (the FLT precedent, 1e6*eps)."""
    gl = res.grouped_legendre("float32")
    sym, asym = _coeffs(res, 2, seed=3)
    ref = legendre_matmul.legendre_inv_grouped(sym, asym, gl)
    out = legendre_pallas.legendre_inv_grouped(
        sym, asym, gl, mode="bf16", interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e6 * np.finfo(np.float32).eps * scale
