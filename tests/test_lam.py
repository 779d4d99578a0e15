"""LAM (etrans-equivalent) bi-Fourier transform tests.

Modeled on the reference LAM ctest coverage (tests/CMakeLists.txt:333-411:
48x40 benchmark checks) and the adjoint identity tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ectrans_tpu.lam import (
    LamInvFlags,
    biperiodicize,
    dir_trans_lam,
    dir_trans_lam_adj,
    egpnorm,
    ellips,
    especnorm,
    inv_trans_lam,
    inv_trans_lam_adj,
    make_lam_grid,
    setup_lam,
)


def lam_res(nx=48, ny=40, **kw):
    return setup_lam(make_lam_grid(nx, ny, **kw))


def random_packed(res, nfld, seed=0):
    rng = np.random.default_rng(seed)
    spec = rng.standard_normal((nfld, res.nspec2))
    # physical-field constraints: purely real modes where a conjugate pair
    # degenerates (m=0 zonal-imag part, n=0 meridional-imag part)
    t = res.device_tables("float64")
    pm = np.asarray(res.packed_m)
    pn = np.asarray(res.packed_n)
    pc = np.asarray(res.packed_c)
    kill = ((pm == 0) & (pc >= 2)) | ((pn == 0) & (pc % 2 == 1))
    spec[:, kill] = 0.0
    return spec


def test_ellips_matches_reference_shape():
    kn, km = ellips(20, 30)
    assert kn[0] == 20 and kn[30] == 0
    assert km[0] == 30 and km[20] == 0
    # ellipse relation: kn[m] ~ nsmax/msmax*sqrt(msmax^2-m^2)
    assert kn[15] == int(20 / 30 * np.sqrt(30**2 - 15**2) + 1e-10)


def test_lam_scalar_roundtrip():
    res = lam_res()
    spec = random_packed(res, 3)
    grid = inv_trans_lam(res, spscalar=jnp.asarray(spec), dtype=jnp.float64)
    assert grid.shape == (3, 40, 48)
    _, _, spec2, _, _ = dir_trans_lam(res, scalars=grid, dtype=jnp.float64)
    err = np.abs(np.asarray(spec2) - spec).max()
    assert err < 1e-12, err


def test_lam_analytic_mode():
    """A single (m, n) coefficient must synthesize the analytic biperiodic
    wave with the packed component conventions of eprfi1b_mod.F90."""
    res = lam_res(32, 24)
    g = res.grid
    x = 2 * np.pi * np.arange(g.nx) / g.nx
    y = 2 * np.pi * np.arange(g.ny) / g.ny
    m, n = 3, 2
    base = int(res.nesm0[m]) + 4 * n
    for c, expect_fn in [
        (0, lambda: 4 * np.cos(n * y)[:, None] * np.cos(m * x)[None, :]),
        (1, lambda: -4 * np.sin(n * y)[:, None] * np.cos(m * x)[None, :]),
        (2, lambda: -4 * np.cos(n * y)[:, None] * np.sin(m * x)[None, :]),
        (3, lambda: 4 * np.sin(n * y)[:, None] * np.sin(m * x)[None, :]),
    ]:
        spec = np.zeros((1, res.nspec2))
        spec[0, base + c] = 1.0
        grid = np.asarray(
            inv_trans_lam(res, spscalar=jnp.asarray(spec), dtype=jnp.float64)
        )[0]
        err = np.abs(grid - expect_fn()).max()
        assert err < 1e-12, (c, err)


def test_lam_derivatives_analytic():
    """E-W and N-S derivative flags against analytic cos-wave derivatives."""
    res = lam_res(32, 24, dx=2.0, dy=3.0)
    g = res.grid
    x = np.arange(g.nx) * g.dx
    y = np.arange(g.ny) * g.dy
    m, n = 2, 3
    kx = m * g.exwn
    ky = n * g.eywn
    spec = np.zeros((1, res.nspec2))
    spec[0, int(res.nesm0[m]) + 4 * n] = 1.0  # RR component
    grid = np.asarray(
        inv_trans_lam(
            res, spscalar=jnp.asarray(spec),
            flags=LamInvFlags(scders=True), dtype=jnp.float64,
        )
    )
    f = 4 * np.cos(ky * y)[:, None] * np.cos(kx * x)[None, :]
    dfdy = -4 * ky * np.sin(ky * y)[:, None] * np.cos(kx * x)[None, :]
    dfdx = -4 * kx * np.cos(ky * y)[:, None] * np.sin(kx * x)[None, :]
    assert np.abs(grid[0] - f).max() < 1e-12
    assert np.abs(grid[1] - dfdy).max() < 1e-12   # N-S derivs (scders slot 2)
    assert np.abs(grid[2] - dfdx).max() < 1e-12   # E-W derivs


def test_lam_vordiv_roundtrip_with_mean_wind():
    res = lam_res()
    nuv = 2
    vor = random_packed(res, nuv, seed=1)
    div = random_packed(res, nuv, seed=2)
    # (0,0) vor/div carry no wind info (rlepinm = 0 there): zero them
    for s in (vor, div):
        s[:, 0:4] = 0.0
    meanu = np.array([1.5, -0.5])
    meanv = np.array([0.25, 2.0])
    grid = inv_trans_lam(
        res, jnp.asarray(vor), jnp.asarray(div),
        meanu=jnp.asarray(meanu), meanv=jnp.asarray(meanv), dtype=jnp.float64,
    )
    u, v = grid[:nuv], grid[nuv : 2 * nuv]
    vor2, div2, _, mu2, mv2 = dir_trans_lam(res, u=u, v=v, dtype=jnp.float64)
    assert np.abs(np.asarray(vor2) - vor).max() < 1e-10
    assert np.abs(np.asarray(div2) - div).max() < 1e-10
    assert np.abs(np.asarray(mu2) - meanu).max() < 1e-12
    assert np.abs(np.asarray(mv2) - meanv).max() < 1e-12


def test_lam_adjoint_identity():
    """<F x, y> == <x, F^T y> for both LAM transforms (reference
    test_adjoint.F90 tolerance model)."""
    res = lam_res(32, 24)
    rng = np.random.default_rng(5)
    nuv, nsc = 1, 2
    spvor = random_packed(res, nuv, seed=11)
    spdiv = random_packed(res, nuv, seed=12)
    spsc = random_packed(res, nsc, seed=13)
    meanu = rng.standard_normal(nuv)
    meanv = rng.standard_normal(nuv)
    flags = LamInvFlags(scders=True, uvders=True)
    fx = np.asarray(
        inv_trans_lam(res, jnp.asarray(spvor), jnp.asarray(spdiv),
                      jnp.asarray(spsc), jnp.asarray(meanu), jnp.asarray(meanv),
                      flags=flags, dtype=jnp.float64)
    )
    y = rng.standard_normal(fx.shape)
    va, da, sa, mua, mva = inv_trans_lam_adj(
        res, jnp.asarray(y), nuv, nsc, flags=flags, dtype=jnp.float64
    )
    lhs = np.sum(fx * y)
    rhs = (
        np.sum(np.asarray(va) * spvor) + np.sum(np.asarray(da) * spdiv)
        + np.sum(np.asarray(sa) * spsc)
        + np.sum(np.asarray(mua) * meanu) + np.sum(np.asarray(mva) * meanv)
    )
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))

    # direct transform adjoint
    u = rng.standard_normal((nuv, res.grid.ny, res.grid.nx))
    v = rng.standard_normal((nuv, res.grid.ny, res.grid.nx))
    sc = rng.standard_normal((nsc, res.grid.ny, res.grid.nx))
    vor2, div2, sc2, mu2, mv2 = dir_trans_lam(
        res, jnp.asarray(u), jnp.asarray(v), jnp.asarray(sc), dtype=jnp.float64
    )
    yv = random_packed(res, nuv, seed=21)
    yd = random_packed(res, nuv, seed=22)
    ys = random_packed(res, nsc, seed=23)
    ymu = rng.standard_normal(nuv)
    ymv = rng.standard_normal(nuv)
    ua, va2, sca = dir_trans_lam_adj(
        res, jnp.asarray(yv), jnp.asarray(yd), jnp.asarray(ys),
        jnp.asarray(ymu), jnp.asarray(ymv), nfld_uv=nuv, nfld_sc=nsc,
        dtype=jnp.float64,
    )
    lhs = (
        np.sum(np.asarray(vor2) * yv) + np.sum(np.asarray(div2) * yd)
        + np.sum(np.asarray(sc2) * ys)
        + np.sum(np.asarray(mu2) * ymu) + np.sum(np.asarray(mv2) * ymv)
    )
    rhs = (
        np.sum(np.asarray(ua) * u) + np.sum(np.asarray(va2) * v)
        + np.sum(np.asarray(sca) * sc)
    )
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_biper_spline_periodic_smooth():
    """Spline biperiodicization: C+I data unchanged, extension closes the
    period with small jumps relative to the field scale."""
    grid = make_lam_grid(64, 48, nxux=53, nyux=37)
    gy, gx = np.meshgrid(np.arange(37), np.arange(53), indexing="ij")
    f = np.sin(gx / 7.0) + 0.5 * np.cos(gy / 5.0)
    out = np.asarray(biperiodicize(jnp.asarray(f[None]), grid, mode="spline"))[0]
    assert out.shape == (48, 64)
    assert np.abs(out[:37, :53] - f).max() < 1e-12  # C+I untouched
    # periodic continuity: wrap jumps comparable to interior gradients
    interior_jump = np.abs(np.diff(f, axis=1)).max()
    wrap_jump_x = np.abs(out[:, 0] - out[:, -1]).max()
    wrap_jump_y = np.abs(out[0, :] - out[-1, :]).max()
    assert wrap_jump_x < 5 * interior_jump
    assert wrap_jump_y < 5 * interior_jump


def test_biper_then_transform_roundtrip():
    """biperiodicize + dir + inv reproduces the C+I data to spectral
    truncation accuracy."""
    grid = make_lam_grid(64, 48, nxux=53, nyux=37)
    res = setup_lam(grid)
    gy, gx = np.meshgrid(np.arange(37), np.arange(53), indexing="ij")
    f = np.sin(2 * np.pi * gx / 64) * np.cos(2 * np.pi * gy / 48)
    ext = biperiodicize(jnp.asarray(f[None]), grid, mode="spline")
    _, _, spec, _, _ = dir_trans_lam(res, scalars=ext, dtype=jnp.float64)
    back = np.asarray(inv_trans_lam(res, spscalar=spec, dtype=jnp.float64))[0]
    err = np.abs(back[:37, :53] - f).max()
    assert err < 0.05, err  # truncation-limited, not exact


def test_lam_norms():
    res = lam_res()
    spec = random_packed(res, 2, seed=3)
    nrm = np.asarray(especnorm(res, jnp.asarray(spec)))
    expect = np.sqrt((spec**2).sum(axis=1))
    assert np.abs(nrm - expect).max() < 1e-12
    grid = inv_trans_lam(res, spscalar=jnp.asarray(spec), dtype=jnp.float64)
    ave, gmin, gmax = egpnorm(res, grid)
    assert np.all(np.asarray(gmin) <= np.asarray(ave))
    assert np.all(np.asarray(ave) <= np.asarray(gmax))
