"""ectrans4py-compatibility layer tests, replaying the reference's own
golden pytest (tests/test_ectrans4py/test_ectrans4py.py) through our
compat functions where the data is available."""

import os
import pathlib

import numpy as np
import pytest

from ectrans_tpu import compat4py as e4

DATA = pathlib.Path(
    os.environ.get(
        "ECTRANS_REF_DATA", "/root/reference/tests/test_ectrans4py/data"
    )
)
have_data = DATA.exists()


def test_version():
    assert "ectrans_tpu" in e4.ectrans_version()


@pytest.mark.skipif(not have_data, reason="reference golden data missing")
def test_trans_inq4py_golden():
    nloen = np.load(DATA / "lon_number_by_lat.npy")
    zw = np.load(DATA / "zonal_wavenumbers.npy")
    ngptot, nspec, knmeng = e4.trans_inq4py(150, 148, len(nloen), nloen)
    assert (ngptot, nspec) == (33052, 11175)  # reference expected values
    np.testing.assert_array_equal(knmeng[:150], zw)


@pytest.mark.skipif(not have_data, reason="reference golden data missing")
def test_get_legendre_assets_weights():
    nloen = np.load(DATA / "lon_number_by_lat.npy")
    nspec = sum(148 + 2 - im for im in range(149))
    knmeng, pgw, prpnm = e4.get_legendre_assets(150, 148, len(nloen), nspec,
                                                nloen)
    assert abs(pgw.sum() - 1.0) < 1e-10
    assert prpnm.shape == (len(nloen) // 2, nspec)


@pytest.mark.skipif(not have_data, reason="reference golden data missing")
def test_sp2gp_gauss_golden():
    nloen = np.load(DATA / "lon_number_by_lat.npy")
    sp = np.load(DATA / "tl149-c24-s1t@sp.npy")
    gp = np.load(DATA / "tl149-c24-s1t@sp2gp.npy").reshape(150, -1)
    gp_reduced = np.concatenate(
        [gp[i, : int(nl)] for i, nl in enumerate(nloen)]
    )
    out, _, _ = e4.sp2gp_gauss4py(150, 148, 10, int(sum(nloen)), len(nloen),
                                  nloen, len(sp), False, False, sp)
    assert np.abs(out - gp_reduced).max() < 1e-9


@pytest.mark.skipif(not have_data, reason="reference golden data missing")
def test_gp2sp_gauss_golden():
    nloen = np.load(DATA / "lon_number_by_lat.npy")
    sp = np.load(DATA / "tl149-c24-s1t@sp.npy")
    gp = np.load(DATA / "tl149-c24-s1t@sp2gp.npy").reshape(150, -1)
    gp_reduced = np.concatenate(
        [gp[i, : int(nl)] for i, nl in enumerate(nloen)]
    )
    out = e4.gp2sp_gauss4py(len(sp), 150, 148, 10, len(nloen), nloen,
                            len(gp_reduced), False, gp_reduced)
    assert np.abs(out - sp).max() < 1e-9


@pytest.mark.skipif(not have_data, reason="reference golden data missing")
def test_lam_4py_golden():
    sp = np.load(DATA / "antwrp1300-s1t@sp.npy")
    gp = np.load(DATA / "antwrp1300-s1t@sp2gp.npy").ravel()
    ngptot, nspec = e4.etrans_inq4py(54, 48, 43, 37, 26, 23, 10, 1300.0, 1300.0)
    assert (ngptot, nspec) == (2592, 1968)  # reference expected values
    out, _, _ = e4.sp2gp_lam4py(54, 48, 43, 37, 26, 23, 10, len(sp), False,
                                False, 1300.0, 1300.0, sp)
    assert np.abs(out - gp).max() < 1e-9
    back = e4.gp2sp_lam4py(len(sp), 54, 48, 43, 37, 26, 23, 10, 1300.0,
                           1300.0, False, gp)
    assert np.abs(back - sp).max() < 1e-9


def test_reorder_roundtrip_global():
    """FA <-> model reorder must be mutually inverse on the m>0 content."""
    rng = np.random.default_rng(0)
    ktrunc = 13
    nspec2 = (ktrunc + 1) * (ktrunc + 2)
    model = rng.standard_normal(nspec2)
    # m=0 imaginary parts are dropped by the FA layout: zero them
    model[1 : 2 * (ktrunc + 1) : 2] = 0.0
    fa_len = nspec2 + (ktrunc + 1)  # FA blocks hold 2n+2 values each
    fa = e4._reorder_model_to_fa(model, ktrunc, fa_len)
    back = e4._reorder_fa_to_model(fa, ktrunc, nspec2)
    assert np.abs(back - model).max() == 0.0


def test_reorder_roundtrip_lam():
    from ectrans_tpu.lam import make_lam_grid, setup_lam

    rng = np.random.default_rng(1)
    res = setup_lam(make_lam_grid(32, 24, msmax=10, nsmax=8))
    model = rng.standard_normal(res.nspec2)
    fa = e4._lam_reorder_model_to_fa(model, res, res.nspec2)
    back = e4._lam_reorder_fa_to_model(fa, res)
    assert np.abs(back - model).max() == 0.0


def test_sp2gp_fft1d():
    ktrunc, L = 5, 32
    spec = np.zeros(2 * (ktrunc + 1))
    spec[2 * 3] = 1.0       # re of mode 3
    spec[2 * 2 + 1] = 0.5   # im of mode 2
    out = e4.sp2gp_fft1d4py(len(spec), ktrunc, spec, L)
    x = 2 * np.pi * np.arange(L) / L
    expect = 2 * np.cos(3 * x) - 2 * 0.5 * np.sin(2 * x)
    assert np.abs(out - expect).max() < 1e-12


def test_fa_ordering_closed_form():
    """Pin the FA<->model reorder against the closed-form FA index derived
    independently from the reference loop (gp2sp_gauss4py.F90:92-107):
    block centers NASM0_fa(n) = n^2+n+1 (1-based), re(m,n) at center+m,
    im(m,n) at center-m (dropped for m=0).  A systematic error identical
    in both reorder directions would pass roundtrip tests; this pins the
    absolute placement."""
    from ectrans_tpu.compat4py import (_reorder_model_to_fa,
                                       _reorder_fa_to_model)

    trunc = 5
    nspec2 = sum(2 * (trunc - m + 1) for m in range(trunc + 1))
    ksize = (trunc + 1) * (trunc + 2)  # sum of (2n+2)

    # model (ecTrans packed) order: m-major, n ascending, (re, im)
    model = np.zeros(nspec2)
    ji = 0
    coeffs = {}
    for m in range(trunc + 1):
        for n in range(m, trunc + 1):
            re, im = 100 * m + n, -(100 * m + n)
            model[ji] = re
            model[ji + 1] = 0.0 if m == 0 else im
            coeffs[(m, n)] = (re, 0.0 if m == 0 else im)
            ji += 2

    fa = _reorder_model_to_fa(model, trunc, ksize)
    for (m, n), (re, im) in coeffs.items():
        center = n * n + n + 1  # 1-based closed form
        assert fa[center + m - 1] == re, (m, n)
        if m != 0:
            assert fa[center - m - 1] == im, (m, n)

    back = _reorder_fa_to_model(fa, trunc, nspec2)
    assert np.array_equal(back, model)
