"""Utilities: NPROMA blocking, checksums, timing, FSPGL hook, LamTransform."""

import io

import jax.numpy as jnp
import numpy as np

import ectrans_tpu as et
from ectrans_tpu.lam import LamTransform
from ectrans_tpu.transform import InvFlags
from ectrans_tpu.utils import (
    blocked_to_fields,
    field_checksum,
    fields_to_blocked,
    gstats,
    gstats_report,
    hook,
    reset_gstats,
)


def test_nproma_blocking_roundtrip():
    res = et.setup("O48", 47)
    rng = np.random.default_rng(0)
    f = rng.standard_normal((3, res.ndgl, res.grid.ndlon))
    # zero the padding (points beyond nloen) as the transform output does
    mask = np.arange(res.grid.ndlon)[None, :] < np.asarray(res.grid.nloen)[:, None]
    f = f * mask[None]
    blocked = fields_to_blocked(f, res.grid, nproma=17)
    assert blocked.shape[0] == 17 and blocked.shape[1] == 3
    back = blocked_to_fields(blocked, res.grid)
    assert np.array_equal(back, f)


def test_checksum_stable_and_sensitive():
    a = np.arange(12.0).reshape(3, 4)
    c1 = field_checksum(a)
    assert c1 == field_checksum(a.copy())
    b = a.copy()
    b[0, 0] += 1e-15
    assert field_checksum(b) != c1


def test_gstats_report():
    reset_gstats()
    with gstats("phase_a"):
        pass
    with hook("phase_b"):
        pass
    rep = gstats_report(io.StringIO())
    assert "phase_a" in rep and "phase_b" in rep


def test_fspgl_hook_applied():
    res = et.setup("F24", 47)
    rng = np.random.default_rng(1)
    sp = rng.standard_normal((1, res.nspec2))
    sp[:, 1:96:2] = 0

    def double(four):
        return four * 2.0

    g1 = np.asarray(et.inv_trans(res, spscalar=jnp.asarray(sp), dtype=jnp.float64))
    g2 = np.asarray(et.inv_trans(res, spscalar=jnp.asarray(sp), dtype=jnp.float64,
                                 fspgl_proc=double))
    assert np.allclose(g2, 2.0 * g1, atol=1e-12)


def test_lam_transform_handle():
    lt = LamTransform(64, 48, nxux=53, nyux=37, dtype=jnp.float64)
    inq = lt.inquire()
    assert inq["ngptot"] == 64 * 48
    rng = np.random.default_rng(2)
    gy, gx = np.meshgrid(np.arange(37), np.arange(53), indexing="ij")
    f = np.sin(gx / 5.0) * np.cos(gy / 3.0)
    ext = lt.biperiodicize(jnp.asarray(f[None]))
    _, _, sp, _, _ = lt.dir_trans(scalars=ext)
    nrm = lt.specnorm(sp)
    assert np.isfinite(np.asarray(nrm)).all()
    back = lt.inv_trans(spscalar=sp)
    ave, gmin, gmax = lt.gpnorm(back)
    assert np.asarray(gmin) <= np.asarray(ave) <= np.asarray(gmax)


def test_gpnorm_tl_ad():
    """TL/AD of the grid-point average (GPNORM_TRANSTL/AD): adjoint
    identity <TL(x), y> == <x, AD(y)>."""
    from ectrans_tpu import norms

    res = et.setup("O48", 47)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, res.ndgl, res.grid.ndlon)))
    y = jnp.asarray(rng.standard_normal(2))
    tl = norms.gpnorm_tl(res, x)
    ad = norms.gpnorm_ad(res, y)
    lhs = float(jnp.sum(tl * y))
    rhs = float(jnp.sum(ad * x))
    assert abs(lhs - rhs) < 1e-12 * max(1.0, abs(lhs))
