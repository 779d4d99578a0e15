"""High-level API: SpectralTransform, norms, inquiry, vordiv_to_uv, pnm."""

import jax.numpy as jnp
import numpy as np
import scipy.special as sp

import ectrans_tpu as et
from ectrans_tpu.api import SpectralTransform, vordiv_to_uv
from ectrans_tpu.norms import gpnorm, specnorm
from ectrans_tpu.parallel import make_mesh


def test_specnorm_parseval():
    """Parseval: specnorm^2 equals the area-weighted grid mean square."""
    res = et.setup("F24", 47)
    rng = np.random.default_rng(0)
    sc = rng.standard_normal((2, res.nspec2))
    sc[:, 1 : 96 : 2] = 0.0
    sn = np.asarray(specnorm(res, jnp.asarray(sc)))
    grid = et.inv_trans(res, spscalar=jnp.asarray(sc), dtype=jnp.float64)
    ave2, _, _ = gpnorm(res, grid * grid)
    assert np.allclose(sn**2, np.asarray(ave2), rtol=1e-10)


def test_gpnorm_constant_field():
    res = et.setup("O48", 47)
    grid = jnp.ones((1, res.ndgl, res.grid.ndlon), jnp.float64) * 3.5
    ave, gmin, gmax = gpnorm(res, grid)
    assert abs(float(ave[0]) - 3.5) < 1e-12
    assert float(gmin[0]) == 3.5 and float(gmax[0]) == 3.5


def test_inquire():
    st = SpectralTransform("O48", 47)
    q = st.inquire()
    assert q["nspec2"] == st.res.nspec2
    assert q["ngptot"] == sum(st.res.grid.nloen)
    assert q["nmen"].shape == (96,)
    assert abs(np.sum(q["rgw"]) - 1.0) < 1e-13
    assert q["nasm0"][1] == 2 * 48  # after full m=0 block


def test_inquire_distributed():
    """Mesh-attached TRANS_INQ long tail (trans_inq.F90): w/v echo, per-set
    wave lists, and the latitude-ownership arrays NULTPP/NPTRLS/NPROCL/
    NFRSTLAT/NLSTLAT/NGPTOTL."""
    st = SpectralTransform("O48", 47, mesh=make_mesh(4, 2))
    q = st.inquire()
    res = st.res
    assert q["nprtrw"] == 4 and q["nprtrv"] == 2
    # every m owned exactly once across w-sets
    owned = sorted(m for ms in q["myms_w"] for m in ms)
    assert owned == list(range(res.M))
    assert int(np.sum(q["numpp"])) == res.M
    # spectral sizes per w-set sum to the global nspec2
    assert int(np.sum(q["nspec2_w"])) == res.nspec2
    # Fourier-space latitude ownership covers all latitudes
    assert q["nultpp"].shape == (4,)
    assert int(q["nultpp"].sum()) >= res.ndgl
    assert q["nprocl"].shape == (res.ndgl,)
    assert q["nprocl"].max() <= 3
    # grid-space blocks: contiguous, cover all latitudes, gp counts sum
    assert q["nfrstlat"].shape == q["nlstlat"].shape == q["ngptotl"].shape
    assert int(np.sum(q["ngptotl"])) == res.grid.ngptot
    assert q["ngptotmx"] == int(np.max(q["ngptotl"]))
    assert q["nprocl_grid"].shape == (res.ndgl,)
    for s in range(len(q["ngptotl"])):
        rows = np.where(q["nprocl_grid"] == s)[0]
        if len(rows):
            assert rows[0] >= q["nfrstlat"][s]
            assert int(q["ngptotl"][s]) == sum(
                res.grid.nloen[r] for r in rows)


def test_trans_pnm():
    """legendre_polynomials(m) matches scipy at both hemispheres."""
    from math import factorial

    st = SpectralTransform("F24", 47)
    mu, _ = st.res.grid.gauss()
    for m in (0, 3, 17):
        tab = st.legendre_polynomials(m)
        for k, n in [(0, m), (3, m + 3)]:
            norm = np.sqrt((2 * n + 1) * factorial(n - m) / factorial(n + m))
            ref = sp.lpmv(m, n, mu) * ((-1) ** m) * norm
            assert np.abs(tab[k] - ref).max() < 1e-12, (m, n)


def test_vordiv_to_uv_standalone():
    """Standalone VORDIV_TO_UV agrees with the inv_trans internal path."""
    res = et.setup("F24", 47)
    rng = np.random.default_rng(3)
    vor = rng.standard_normal((1, res.nspec2)); vor[:, 1:96:2] = 0
    div = rng.standard_normal((1, res.nspec2)); div[:, 1:96:2] = 0
    su, sv = vordiv_to_uv(res, jnp.asarray(vor), jnp.asarray(div), dtype=jnp.float64)
    assert su.shape == (1, res.nspec2)
    # synthesize U/(a cos) from packed su and compare to inv_trans's u output
    # (n = nsmax+1 row is truncated in the packed form; zero it in the
    # internal path for an apples-to-apples comparison)
    from ectrans_tpu.ops import layout, spectral as sops, legendre_matmul
    from ectrans_tpu.ops.fourier import synthesis, tables_for
    from ectrans_tpu.transform import _coeff_tables

    tables = res.device_tables(jnp.float64)
    du = layout.packed_to_dense(jnp.asarray(su), tables)
    sym, asym = layout.dense_to_parity(du, tables)
    gl = res.grouped_legendre("float64")
    four = legendre_matmul.legendre_inv_grouped(sym, asym, gl)
    u1 = synthesis(four * tables.racthe[None, None, None, :], tables_for(res, jnp.float64))

    ct = _coeff_tables(res, "float64")
    dvor = layout.packed_to_dense(jnp.asarray(vor), tables)
    ddiv = layout.packed_to_dense(jnp.asarray(div), tables)
    du2, _ = sops.vordiv_to_uv(dvor, ddiv, ct["vd"])
    du2 = du2 * (jnp.arange(res.NP) <= res.nsmax)  # drop n = nsmax+1 row
    sym2, asym2 = layout.dense_to_parity(du2, tables)
    four2 = legendre_matmul.legendre_inv_grouped(sym2, asym2, gl)
    u2 = synthesis(four2 * tables.racthe[None, None, None, :], tables_for(res, jnp.float64))
    assert np.abs(np.asarray(u1) - np.asarray(u2)).max() < 1e-9


def test_api_sharded_matches_single():
    res_args = ("O48", 47)
    st1 = SpectralTransform(*res_args, dtype=jnp.float64)
    st8 = SpectralTransform(*res_args, mesh=make_mesh(4, 2), dtype=jnp.float64)
    rng = np.random.default_rng(4)
    sc = rng.standard_normal((3, st1.res.nspec2))
    sc[:, 1:96:2] = 0
    g1 = np.asarray(st1.inv_trans(spscalar=jnp.asarray(sc)))
    g8 = np.asarray(st8.inv_trans(spscalar=jnp.asarray(sc)))
    assert np.abs(g1 - g8).max() / np.abs(g1).max() < 1e-13
    # dist/gath helpers round trip
    gd = st8.dist_grid(g1)
    assert np.abs(st8.gath_grid(gd) - g1).max() == 0.0


def test_stretched_sphere_setup():
    """PSTRET equivalent (suleg_mod.F90:272-287): Legendre polynomials are
    evaluated at the Schmidt-stretched latitudes; stretch=1 is unchanged."""
    import numpy as np
    import scipy.special as sp
    from math import factorial

    import ectrans_tpu as et

    r1 = et.setup("F24", 47)
    r2 = et.setup("F24", 47, stretch=1.0)
    assert np.array_equal(r1.mu, r2.mu)  # stretch=1 is a no-op
    c = 2.4
    rs = et.setup("F24", 47, stretch=c)
    t = (1 - c * c) / (1 + c * c)
    mu0, _ = rs.grid.gauss()
    expect_nh = (t + mu0[:24]) / (1 + t * mu0[:24])
    assert np.allclose(rs.mu[:24], expect_nh, atol=1e-14)
    # P table actually evaluated at stretched latitudes
    m, n = 2, 5
    norm = np.sqrt((2 * n + 1) * factorial(n - m) / factorial(n + m))
    want = sp.lpmv(m, n, expect_nh) * norm
    k = (n - m) // 2  # n-m odd -> pasym
    got = np.asarray(rs.pasym[m, :, (n - m) // 2])
    assert np.abs(got - want).max() < 1e-12


def test_get_current_and_ini_spec_dist():
    import ectrans_tpu as et
    from ectrans_tpu.resolution import get_current, ini_spec_dist

    res = et.setup("F24", 47)
    assert get_current() is res
    d = ini_spec_dist(47, 3)
    assert sum(d["numpp"]) == 48
    assert sum(d["nspec2"]) == d["nspec2_g"] == res.nspec2
    # ping-pong balance: coefficient counts within one m-row of each other
    assert max(d["nspec2"]) - min(d["nspec2"]) <= 2 * 48
    np.testing.assert_array_equal(d["nasm0"], res.nasm0)


def test_trans_end():
    import ectrans_tpu as et
    from ectrans_tpu.resolution import get_current, trans_end

    res = et.setup("F24", 47)
    assert get_current() is not None
    trans_end()
    assert get_current() is None
    # setup after trans_end works (caches rebuilt)
    res2 = et.setup("F24", 47)
    assert res2.nspec2 == res.nspec2
