"""Distributed LAM transforms: decomposition invariance vs single device
(the reference's MPI-vs-serial checksum strategy, tests/compare_checksums.py,
applied to the LAM path on the 8-virtual-device CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ectrans_tpu.lam import (LamInvFlags, dir_trans_lam, inv_trans_lam,
                             make_lam_grid, setup_lam)
from ectrans_tpu.lam.sharded import ShardedLamTransform
from ectrans_tpu.parallel import make_mesh


def lam_res():
    return setup_lam(make_lam_grid(48, 40))


def random_packed(res, nfld, seed=0):
    rng = np.random.default_rng(seed)
    spec = rng.standard_normal((nfld, res.nspec2))
    pm = np.asarray(res.packed_m)
    pn = np.asarray(res.packed_n)
    pc = np.asarray(res.packed_c)
    spec[:, ((pm == 0) & (pc >= 2)) | ((pn == 0) & (pc % 2 == 1))] = 0.0
    return spec


@pytest.mark.parametrize("w,v", [(4, 2), (8, 1), (2, 2)])
def test_lam_sharded_matches_single(w, v):
    res = lam_res()
    st = ShardedLamTransform(res, make_mesh(w, v), dtype=jnp.float64)
    flags = LamInvFlags(scders=True, uvders=True)
    nuv, nsc = 2, 3
    spvor = random_packed(res, nuv, 1)
    spdiv = random_packed(res, nuv, 2)
    spsc = random_packed(res, nsc, 3)
    for s in (spvor, spdiv):
        s[:, 0:4] = 0.0
    meanu = np.array([0.5, -1.0])
    meanv = np.array([2.0, 0.25])

    ref = np.asarray(inv_trans_lam(
        res, jnp.asarray(spvor), jnp.asarray(spdiv), jnp.asarray(spsc),
        jnp.asarray(meanu), jnp.asarray(meanv), flags=flags, dtype=jnp.float64,
    ))
    got = np.asarray(st.inv_trans(spvor, spdiv, spsc, meanu, meanv, flags=flags))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-11, np.abs(got - ref).max()

    u = ref[:nuv]
    vv = ref[nuv : 2 * nuv]
    sc = ref[2 * nuv : 2 * nuv + nsc]
    rv, rd, rs, rmu, rmv = dir_trans_lam(
        res, jnp.asarray(u), jnp.asarray(vv), jnp.asarray(sc), dtype=jnp.float64
    )
    gv, gd, gs, gmu, gmv = st.dir_trans(u, vv, sc)
    assert np.abs(np.asarray(gv) - np.asarray(rv)).max() < 1e-11
    assert np.abs(np.asarray(gd) - np.asarray(rd)).max() < 1e-11
    assert np.abs(np.asarray(gs) - np.asarray(rs)).max() < 1e-11
    assert np.abs(np.asarray(gmu) - np.asarray(rmu)).max() < 1e-12
    assert np.abs(np.asarray(gmv) - np.asarray(rmv)).max() < 1e-12


def test_lam_sharded_scalars_only():
    res = lam_res()
    st = ShardedLamTransform(res, make_mesh(4, 2), dtype=jnp.float64)
    spsc = random_packed(res, 5, 9)
    ref = np.asarray(inv_trans_lam(res, spscalar=jnp.asarray(spsc),
                                   dtype=jnp.float64))
    got = np.asarray(st.inv_trans(spscalar=spsc))
    assert np.abs(got - ref).max() < 1e-11
    _, _, rs, _, _ = dir_trans_lam(res, scalars=jnp.asarray(ref),
                                   dtype=jnp.float64)
    _, _, gs, _, _ = st.dir_trans(scalars=ref)
    assert np.abs(np.asarray(gs) - np.asarray(rs)).max() < 1e-11
