"""Analytic (physics-exact) anchoring of the wind / derivative conventions.

The reference binaries cannot be built in this image (no Fortran compiler —
see BASELINE.md), so the vor/div→u,v map (VDTUV, ``vdtuv_mod.F90:110-145``),
the N-S derivative scaling (SPNSDE + FSC, ``spnsde_mod.F90``,
``fsc_mod.F90:135-190``) and the E-W derivative scaling are pinned here
against closed-form vector-calculus ground truth instead: fields whose winds,
vorticity, divergence and derivatives are known analytically.  The reference
implements exactly these physical definitions (true winds in m/s, true
eastward/northward derivatives in 1/m), so agreeing with the closed forms to
fp64 round-off is agreeing with the reference.

Conventions verified (reference contract, ``inv_trans.F90:58-106``):
* grid u, v are true winds;  spectral vor/div are true ζ = k·∇×V, D = ∇·V,
* E-W derivative outputs are (1/(a cosφ)) ∂/∂λ   (true eastward, 1/m),
* N-S derivative outputs are (1/a) ∂/∂φ          (true northward, 1/m).

Cases: rotational flow from a streamfunction that is a pure spherical
harmonic (ζ = ∇²ψ = -n(n+1)ψ/a²), divergent flow from a velocity potential,
and the Rossby-Haurwitz wave of Williamson et al. (1992), case 6 — the
standard closed-form test for exactly this pipeline.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import ectrans_tpu as et
from ectrans_tpu.resolution import EARTH_RADIUS
from ectrans_tpu.transform import InvFlags

A = EARTH_RADIUS


@pytest.fixture(scope="module")
def res():
    # quadratic full grid: products of two T21-band-limited fields stay
    # exactly representable after the direct transform
    return et.setup("F48", 47)


def _grid_angles(res):
    """(lam[1,nlon], phi[nlat,1]) with the framework's grid layout
    (latitudes north->south, longitudes 0..2pi)."""
    phi = np.arcsin(res.mu)[:, None]
    lam = 2.0 * np.pi * np.arange(res.grid.ndlon)[None, :] / res.grid.ndlon
    return lam, phi


def _dir_uv(res, u, v):
    spvor, spdiv, _ = et.dir_trans(
        res,
        u=jnp.asarray(u[None]), v=jnp.asarray(v[None]),
        dtype=jnp.float64,
    )
    return spvor, spdiv


def test_rotational_harmonic_winds_and_vorticity(res):
    """psi = a^2 sinφ cos²φ cos2λ  (a pure Y_3^2 harmonic):
    u = -(1/a)∂ψ/∂φ, v = (1/(a cosφ))∂ψ/∂λ, ζ = ∇²ψ = -12 ψ / a²."""
    lam, phi = _grid_angles(res)
    sin, cos = np.sin(phi), np.cos(phi)
    psi = A * A * sin * cos**2 * np.cos(2 * lam)
    u = -A * (cos**3 - 2 * sin**2 * cos) * np.cos(2 * lam)
    v = -2 * A * sin * cos * np.sin(2 * lam)
    zeta = -12.0 * sin * cos**2 * np.cos(2 * lam)

    spvor, spdiv = _dir_uv(res, u, v)
    flags = InvFlags(vorgp=True, divgp=True, uvders=True)
    out = np.asarray(
        et.inv_trans(res, spvor=spvor, spdiv=spdiv, flags=flags,
                     dtype=jnp.float64)
    )
    # ordering: vor, div, u, v, ew(u), ew(v)
    scale = np.abs(zeta).max()
    assert np.abs(out[0] - zeta).max() < 1e-9 * scale
    assert np.abs(out[1]).max() < 1e-9 * scale          # div == 0
    assert np.abs(out[2] - u).max() < 1e-9 * np.abs(u).max()
    assert np.abs(out[3] - v).max() < 1e-9 * np.abs(u).max()
    # E-W derivatives: (1/(a cosφ)) ∂/∂λ of the analytic winds
    dudl = 2 * A * (cos**3 - 2 * sin**2 * cos) * np.sin(2 * lam) / (A * cos)
    dvdl = -4 * A * sin * cos * np.cos(2 * lam) / (A * cos)
    dscale = np.abs(dudl).max()
    assert np.abs(out[4] - dudl).max() < 1e-9 * dscale
    assert np.abs(out[5] - dvdl).max() < 1e-9 * dscale


def test_divergent_harmonic_winds_and_divergence(res):
    """chi = a^2 sinφ cos²φ cos2λ: u = (1/(a cosφ))∂χ/∂λ,
    v = (1/a)∂χ/∂φ, D = ∇²χ = -12 χ / a²."""
    lam, phi = _grid_angles(res)
    sin, cos = np.sin(phi), np.cos(phi)
    chi = A * A * sin * cos**2 * np.cos(2 * lam)
    # (1/(a cosφ)) ∂χ/∂λ = -2 a sinφ cosφ sin2λ
    u = -2 * A * sin * cos * np.sin(2 * lam)
    v = A * (cos**3 - 2 * sin**2 * cos) * np.cos(2 * lam)
    div = -12.0 * sin * cos**2 * np.cos(2 * lam)

    spvor, spdiv = _dir_uv(res, u, v)
    flags = InvFlags(vorgp=True, divgp=True)
    out = np.asarray(
        et.inv_trans(res, spvor=spvor, spdiv=spdiv, flags=flags,
                     dtype=jnp.float64)
    )
    scale = np.abs(div).max()
    assert np.abs(out[0]).max() < 1e-9 * scale          # vor == 0
    assert np.abs(out[1] - div).max() < 1e-9 * scale
    assert np.abs(out[2] - u).max() < 1e-9 * np.abs(u).max()
    assert np.abs(out[3] - v).max() < 1e-9 * np.abs(u).max()


def test_rossby_haurwitz_wave(res):
    """Williamson case 6 closed forms (R=4): the standard benchmark state.

    u = aω cosφ + aK cos^{R-1}φ (R sin²φ - cos²φ) cosRλ
    v = -aKR cos^{R-1}φ sinφ sinRλ
    ζ = 2ω sinφ - K sinφ cos^Rφ (R²+3R+2) cosRλ ,  D = 0
    """
    R = 4
    omega = 7.848e-6
    K = 7.848e-6
    lam, phi = _grid_angles(res)
    sin, cos = np.sin(phi), np.cos(phi)
    u = A * omega * cos + A * K * cos ** (R - 1) * (R * sin**2 - cos**2) * np.cos(R * lam)
    v = -A * K * R * cos ** (R - 1) * sin * np.sin(R * lam)
    zeta = 2 * omega * sin - K * sin * cos**R * (R * R + 3 * R + 2) * np.cos(R * lam)

    spvor, spdiv = _dir_uv(res, u, v)
    flags = InvFlags(vorgp=True, divgp=True)
    out = np.asarray(
        et.inv_trans(res, spvor=spvor, spdiv=spdiv, flags=flags,
                     dtype=jnp.float64)
    )
    scale = np.abs(zeta).max()
    assert np.abs(out[0] - zeta).max() < 1e-9 * scale
    assert np.abs(out[1]).max() < 1e-9 * scale
    assert np.abs(out[2] - u).max() < 1e-9 * np.abs(u).max()
    assert np.abs(out[3] - v).max() < 1e-9 * np.abs(u).max()


def test_scalar_derivative_scalings(res):
    """T = sinφ cos²φ cos2λ: scders outputs must be the true eastward and
    northward derivatives (1/(a cosφ))∂T/∂λ and (1/a)∂T/∂φ."""
    lam, phi = _grid_angles(res)
    sin, cos = np.sin(phi), np.cos(phi)
    T = sin * cos**2 * np.cos(2 * lam)
    # dT/dλ = -2 sinφ cos²φ sin2λ;  true east = that / (a cosφ)
    dT_east = -2 * sin * cos * np.sin(2 * lam) / A
    dT_north = (cos**3 - 2 * sin**2 * cos) * np.cos(2 * lam) / A

    _, _, spsc = et.dir_trans(res, scalars=jnp.asarray(T[None]),
                              dtype=jnp.float64)
    out = np.asarray(
        et.inv_trans(res, spscalar=spsc, flags=InvFlags(scders=True),
                     dtype=jnp.float64)
    )
    # ordering: T, NS derivative, EW derivative
    assert np.abs(out[0] - T).max() < 1e-9
    scale = np.abs(dT_north).max()
    assert np.abs(out[1] - dT_north).max() < 1e-9 * scale
    assert np.abs(out[2] - dT_east).max() < 1e-9 * scale
