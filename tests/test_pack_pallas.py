"""Pallas packed-compaction kernel vs the XLA gather formulation.

The kernel must reproduce layout.dense_to_packed bit-exactly (it moves
the same fp32 values, no arithmetic) on every grid family and field
count, including tiles shared by many tail m-blocks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import ectrans_tpu as et
from ectrans_tpu.ops import layout, pack_pallas


@pytest.mark.parametrize("config", ["T47", "O48", "O160"])
@pytest.mark.parametrize("nfld", [1, 3, 10])
def test_compact_matches_gather(config, nfld):
    res = et.setup(config)
    tables = res.device_tables(jnp.float32)
    rng = np.random.default_rng(7)
    dense = jnp.asarray(
        rng.standard_normal((nfld, 2, res.M, res.NP)), jnp.float32)
    # the packed layout only reads the valid (m <= n <= nsmax) region
    dense = dense * tables.dense_valid
    want = np.asarray(layout.dense_to_packed(dense, tables))
    plan = pack_pallas.plan_for(res)
    got = np.asarray(pack_pallas.dense_to_packed(dense, plan,
                                                 interpret=True))
    np.testing.assert_array_equal(got, want)


def test_dir_trans_pack_kernel_end_to_end(monkeypatch):
    """Full dir_trans with the dense engine + compaction kernel (interpret
    mode) must match the XLA-engine gather path."""
    res = et.setup("O48")
    rng = np.random.default_rng(11)
    gshape = (2, res.ndgl, res.grid.ndlon)
    u = jnp.asarray(rng.standard_normal(gshape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(gshape), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((3,) + gshape[1:]), jnp.float32)
    want = et.dir_trans(res, u, v, sc)
    monkeypatch.setenv("ECTRANS_TPU_LEG_KERNEL", "dense")
    monkeypatch.setenv("ECTRANS_TPU_PACK_KERNEL", "force")
    got = et.dir_trans(res, u, v, sc)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=1e-5)


def test_compact_mmajor_direct():
    """packed_from_mmajor consumes c-major m-major realigned rows with
    cross-row garbage beyond each row's valid length."""
    res = et.setup("T47")
    tables = res.device_tables(jnp.float32)
    rng = np.random.default_rng(3)
    nfld = 4
    dense = jnp.asarray(
        rng.standard_normal((nfld, 2, res.M, res.NP)), jnp.float32)
    dense = dense * tables.dense_valid
    want = np.asarray(layout.dense_to_packed(dense, tables))
    f, c2, M, W = dense.shape
    flat = jnp.pad(dense.reshape(f, c2, M * W), [(0, 0), (0, 0), (0, M)])
    d2 = flat.reshape(f, c2, M, W + 1)
    mm = d2.transpose(2, 1, 0, 3).reshape(M, 2 * f, W + 1)
    # poison the invalid tail of each row: the kernel must never read it
    mm = mm + 0  # (already carries neighbouring-row garbage from realign)
    plan = pack_pallas.plan_for(res)
    got = np.asarray(pack_pallas.packed_from_mmajor(mm, plan,
                                                    interpret=True))
    np.testing.assert_array_equal(got, want)
