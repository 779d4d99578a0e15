"""Adjoint inner-product identity tests.

Reference: tests/trans/test_adjoint.F90 checks <F(x), y> = <x, F^T(y)> to
2000*eps; test_invtrans_adjoint.F90 uses a T159 vor/div+scalar state at
20000*eps.  jax.linear_transpose makes the identity hold to rounding, but we
assert it against independently generated random states exactly as the
reference does.
"""

import jax.numpy as jnp
import numpy as np

import ectrans_tpu as et
from ectrans_tpu.adjoint import dir_trans_adj, inv_trans_adj
from ectrans_tpu.transform import InvFlags


def _rand_spec(res, n, rng):
    x = rng.standard_normal((n, res.nspec2))
    x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
    return x


def test_inv_trans_adjoint_identity():
    res = et.setup("F24", 47)
    rng = np.random.default_rng(0)
    nuv, nsc = 2, 3
    flags = InvFlags(scders=True, uvders=True)
    vor = jnp.asarray(_rand_spec(res, nuv, rng))
    div = jnp.asarray(_rand_spec(res, nuv, rng))
    sc = jnp.asarray(_rand_spec(res, nsc, rng))
    gx = et.inv_trans(res, vor, div, sc, flags=flags, dtype=jnp.float64)
    y = jnp.asarray(rng.standard_normal(gx.shape))
    lhs = float(jnp.vdot(gx, y))
    va, da, sa = inv_trans_adj(res, y, nuv, nsc, flags=flags, dtype=jnp.float64)
    rhs = float(jnp.vdot(vor, va) + jnp.vdot(div, da) + jnp.vdot(sc, sa))
    rel = abs(lhs - rhs) / abs(lhs)
    assert rel < 2e-13, rel


def test_dir_trans_adjoint_identity():
    res = et.setup("O48", 47)
    rng = np.random.default_rng(1)
    nuv, nsc = 2, 2
    shape = (res.ndgl, res.grid.ndlon)
    u = jnp.asarray(rng.standard_normal((nuv,) + shape))
    v = jnp.asarray(rng.standard_normal((nuv,) + shape))
    sc = jnp.asarray(rng.standard_normal((nsc,) + shape))
    sv, sd, ss = et.dir_trans(res, u, v, sc, dtype=jnp.float64)
    yv = jnp.asarray(_rand_spec(res, nuv, rng))
    yd = jnp.asarray(_rand_spec(res, nuv, rng))
    ys = jnp.asarray(_rand_spec(res, nsc, rng))
    lhs = float(jnp.vdot(sv, yv) + jnp.vdot(sd, yd) + jnp.vdot(ss, ys))
    ua, va_, sa = dir_trans_adj(res, yv, yd, ys, nfld_uv=nuv, nfld_sc=nsc,
                                dtype=jnp.float64)
    rhs = float(jnp.vdot(u, ua) + jnp.vdot(v, va_) + jnp.vdot(sc, sa))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 2e-13, rel


def test_adjoint_roundtrip_gradient():
    """grad of 0.5*||inv_trans(s)||^2 equals inv_trans_adj(inv_trans(s))."""
    import jax

    res = et.setup("F24", 31)
    rng = np.random.default_rng(2)
    sc = jnp.asarray(_rand_spec(res, 1, rng))

    def loss(s):
        g = et.inv_trans(res, spscalar=s, dtype=jnp.float64)
        return 0.5 * jnp.sum(g * g)

    grad = jax.grad(loss)(sc)
    g = et.inv_trans(res, spscalar=sc, dtype=jnp.float64)
    _, _, expect = inv_trans_adj(res, g, 0, 1, dtype=jnp.float64)
    assert np.abs(np.asarray(grad) - np.asarray(expect)).max() < 1e-10
