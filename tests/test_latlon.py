"""Lat-lon output mode (LDLL equivalent): exact spectral evaluation on
equidistant latitudes."""

import numpy as np
import pytest
import scipy.special as sp

import jax.numpy as jnp

import ectrans_tpu as et
from ectrans_tpu.latlon import LatLonGrid, inv_trans_latlon
from ectrans_tpu.transform import InvFlags


@pytest.mark.parametrize("nlat,include_poles", [(19, True), (18, True), (20, False)])
def test_latlon_analytic(nlat, include_poles):
    res = et.setup("F24", 47)
    ll = LatLonGrid(nlat=nlat, nlon=36, include_poles=include_poles)
    from math import factorial

    for m, n, comp in [(0, 3, 0), (2, 5, 0), (4, 9, 1)]:
        spec = np.zeros((1, res.nspec2))
        spec[0, res.nasm0[m] + 2 * (n - m) + comp] = 1.0
        out = np.asarray(
            inv_trans_latlon(res, ll, spscalar=jnp.asarray(spec), dtype=jnp.float64)
        )[0]
        mu = ll.mu
        lam = 2 * np.pi * np.arange(36) / 36
        norm = np.sqrt((2 * n + 1) * factorial(n - m) / factorial(n + m))
        pbar = sp.lpmv(m, n, mu) * ((-1) ** m) * norm
        cm = 1.0 if m == 0 else 2.0
        coeff = 1.0 if comp == 0 else 1.0j
        expect = cm * np.real(coeff * np.exp(1j * m * lam)[None, :]) * pbar[:, None]
        err = np.abs(out - expect).max()
        assert err < 1e-11, (nlat, m, n, comp, err)


def test_latlon_winds_and_derivs_shape():
    res = et.setup("O48", 47)
    ll = LatLonGrid(nlat=25, nlon=48)
    rng = np.random.default_rng(0)

    def packed(nf):
        x = rng.standard_normal((nf, res.nspec2))
        x[:, 1 : 2 * 48 : 2] = 0
        x[:, 0] = 0
        return jnp.asarray(x)

    out = inv_trans_latlon(
        res, ll, packed(1), packed(1), packed(2),
        flags=InvFlags(scders=True, uvders=True), dtype=jnp.float64,
    )
    # u, v, sc(2), nsd(2), uv-ew(2), sc-ew(2)
    assert out.shape == (10, 25, 48)
    assert np.isfinite(np.asarray(out)).all()
    # derivative fields are zeroed at the poles (1/cos singularity)
    assert np.abs(np.asarray(out[4:, 0])).max() == 0.0


def test_latlon_matches_gaussian_at_equator_symmetry():
    """A zonally-symmetric field evaluated on the lat-lon grid must be
    longitude-independent."""
    res = et.setup("F24", 47)
    ll = LatLonGrid(nlat=37, nlon=72)
    spec = np.zeros((1, res.nspec2))
    spec[0, res.nasm0[0] + 2 * 4] = 1.0  # (m=0, n=4)
    out = np.asarray(inv_trans_latlon(res, ll, spscalar=jnp.asarray(spec),
                                      dtype=jnp.float64))[0]
    assert np.abs(out - out[:, :1]).max() < 1e-12


def test_latlon_adjoint_identity():
    """inv_trans_latlon is linear: <F x, y> == <x, F^T y> via vjp."""
    import jax

    res = et.setup("F24", 47)
    ll = LatLonGrid(nlat=19, nlon=36)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, res.nspec2))

    def fwd(s):
        return inv_trans_latlon(res, ll, spscalar=s, dtype=jnp.float64)

    fx, vjp = jax.vjp(fwd, jnp.asarray(x))
    y = rng.standard_normal(fx.shape)
    (xt,) = vjp(jnp.asarray(y))
    lhs = float(jnp.sum(fx * y))
    rhs = float(jnp.sum(xt * x))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_dirtrans_from_latlon():
    """Direct transform from a lat-lon grid (CDMAP mode): synthesize on a
    fine lat-lon grid, analyse back — spectra recovered to interpolation
    accuracy."""
    from ectrans_tpu.latlon import dir_trans_latlon

    res = et.setup("F24", 47)
    ll = LatLonGrid(nlat=288, nlon=192, include_poles=False)
    rng = np.random.default_rng(8)
    sp = rng.standard_normal((2, res.nspec2))
    sp[:, 1 : 2 * 48 : 2] = 0
    grid_ll = inv_trans_latlon(res, ll, spscalar=jnp.asarray(sp),
                               dtype=jnp.float64)
    _, _, sp2 = dir_trans_latlon(res, ll, scalars=grid_ll, dtype=jnp.float64)
    err = np.abs(np.asarray(sp2) - sp).max()
    assert err < 1e-7, err  # interpolation-limited, not spectral-exact


def test_latlon_sharded_matches_single_device():
    """LDLL output on the distributed path == single-device latlon."""
    from ectrans_tpu.parallel import ShardedTransform, make_mesh
    from ectrans_tpu.latlon import LatLonGrid, inv_trans_latlon
    from ectrans_tpu.transform import InvFlags

    res = et.setup("O48", 47)
    rng = np.random.default_rng(31)
    n0 = 2 * (res.nsmax + 1)
    vor = rng.standard_normal((2, res.nspec2))
    div = rng.standard_normal((2, res.nspec2))
    sc = rng.standard_normal((3, res.nspec2))
    for x in (vor, div, sc):
        x[:, 1:n0:2] = 0.0
        x[:, 0] = 0.0
    ll = LatLonGrid(nlat=46, nlon=90)
    flags = InvFlags(scders=True, uvders=True)
    ref = np.asarray(inv_trans_latlon(
        res, ll, jnp.asarray(vor), jnp.asarray(div), jnp.asarray(sc),
        flags=flags, dtype=jnp.float64))
    st = ShardedTransform(res, make_mesh(4, 2), dtype=jnp.float64)
    got = np.asarray(st.inv_trans_latlon(
        ll, jnp.asarray(vor), jnp.asarray(div), jnp.asarray(sc), flags))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-12, err

    # odd nlat (equator row) case, scalars only
    ll2 = LatLonGrid(nlat=45, nlon=90)
    ref2 = np.asarray(inv_trans_latlon(res, ll2, spscalar=jnp.asarray(sc),
                                       dtype=jnp.float64))
    got2 = np.asarray(st.inv_trans_latlon(ll2, spscalar=jnp.asarray(sc)))
    err2 = np.abs(got2 - ref2).max() / np.abs(ref2).max()
    assert err2 < 1e-12, err2
