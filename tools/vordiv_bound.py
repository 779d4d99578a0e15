"""Is the vor/div roundtrip error arithmetic (fixable by double-single
UVTVD/VDTUV) or representation-bound (inherent to fp32 grid winds)?
VERDICT r4 item 5's discriminating experiment.

Variants at one config (vor/div fields only, bench seeds):

  A  production: device fp32 VDTUV -> wind grid roundtrip -> device fp32
     UVTVD (the bench path, engine=dense)
  C  exact host-fp64 VDTUV -> same device roundtrip -> device fp32 UVTVD
     (isolates the UVTVD arithmetic: C-B)
  B  exact host-fp64 VDTUV -> device roundtrip -> exact host-fp64 UVTVD
     (NO fp32 recurrence anywhere: the pure representation floor of
     carrying the winds through an fp32 grid roundtrip)

If B ~= A, the error is representation-bound — double-single recurrences
cannot reduce it and the inherency question closes (reference's own sp
build carries the same conditioning, vdtuv_mod.F90/uvtvd_mod.F90).
If B << A, the recurrence arithmetic is the driver — implement
double-single UVTVD/VDTUV (the reference's spend-fp64-where-conditioned
discipline, ledir_mod.F90:139-172).

Run on the chip:  python tools/vordiv_bound.py [TCO639]
Results checkpointed to evidence/vordiv_bound.json per-variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUV = 2
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "evidence", "vordiv_bound.json")
RESULTS = {}


def emit(k, v):
    RESULTS[k] = v
    print(f"{k}: {v}", flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


# ---------------- host fp64 recurrences (mirror ops/spectral.py) ------


def _sd(x):
    y = np.zeros_like(x)
    y[..., 1:] = x[..., :-1]
    return y


def _su(x):
    y = np.zeros_like(x)
    y[..., :-1] = x[..., 1:]
    return y


def host_vdtuv(vor, div, t):
    a, b, c, valid = t["a"], t["b"], t["c"], t["valid"]
    idiv = np.stack([-div[:, 1], div[:, 0]], axis=1)
    ivor = np.stack([-vor[:, 1], vor[:, 0]], axis=1)
    u = c * idiv + a * _sd(vor) - b * _su(vor)
    v = c * ivor - a * _sd(div) + b * _su(div)
    return u * valid, v * valid


def host_uvtvd(u, v, t):
    p, q, r, valid = t["p"], t["q"], t["r"], t["valid"]
    iu = np.stack([-u[:, 1], u[:, 0]], axis=1)
    iv = np.stack([-v[:, 1], v[:, 0]], axis=1)
    vor = r * iv - p * _su(u) + q * _sd(u)
    div = r * iu + p * _su(v) - q * _sd(v)
    return vor * valid, div * valid


def host_p2d(sp, res):
    nfld = sp.shape[0]
    M, NP = res.M, res.NP
    dense = np.zeros((nfld, 2, M, NP))
    nasm0 = np.asarray(res.nasm0)
    for m in range(M):
        L = res.nsmax + 1 - m
        blk = sp[:, nasm0[m] : nasm0[m] + 2 * L].reshape(nfld, L, 2)
        dense[:, 0, m, m : m + L] = blk[..., 0]
        dense[:, 1, m, m : m + L] = blk[..., 1]
    return dense


def host_d2p(dense, res):
    nfld = dense.shape[0]
    sp = np.zeros((nfld, res.nspec2))
    nasm0 = np.asarray(res.nasm0)
    for m in range(res.M):
        L = res.nsmax + 1 - m
        blk = np.stack(
            [dense[:, 0, m, m : m + L], dense[:, 1, m, m : m + L]], axis=-1)
        sp[:, nasm0[m] : nasm0[m] + 2 * L] = blk.reshape(nfld, 2 * L)
    return sp


def main():
    import jax
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.ops import fourier, legendre_matmul, spectral
    from ectrans_tpu import transform as T

    config = sys.argv[1] if len(sys.argv) > 1 else "TCO639"
    res = et.setup(config)
    emit("config", f"{config} T{res.nsmax}")

    rng = np.random.default_rng(0)

    def packed(n):
        x = rng.standard_normal((n, res.nspec2)).astype(np.float32)
        x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
        x[:, 0] = 0.0
        return x

    spvor, spdiv = packed(NUV), packed(NUV)

    def errs(vor_out, div_out):
        w = {}
        for nm, got, ref in (("vor", vor_out, spvor), ("div", div_out, spdiv)):
            d = np.abs(np.asarray(got, np.float64) - ref)
            d[:, :2] = 0.0
            w[nm] = float(d.max())
        return w

    # ---- A: production ----
    t0 = time.time()
    grid = et.inv_trans(res, spvor=jnp.asarray(spvor), spdiv=jnp.asarray(spdiv))
    sv, sd, _ = et.dir_trans(res, u=grid[:NUV], v=grid[NUV:])
    emit("A_production", {**errs(sv, sd), "s": round(time.time() - t0)})

    # ---- exact host VDTUV ----
    t64 = spectral.vordiv_coeff_tables(res, np.float64)
    dvor64 = host_p2d(spvor.astype(np.float64), res)
    ddiv64 = host_p2d(spdiv.astype(np.float64), res)
    U64, V64 = host_vdtuv(dvor64, ddiv64, t64)
    emit("U_scale", float(np.abs(U64).max()))

    dense_uv32 = jnp.asarray(
        np.concatenate([U64, V64], axis=0).astype(np.float32))

    tables = res.device_tables(jnp.float32)
    fl = res.full_legendre("float32")
    bt = fourier.bucketed_tables_for(res, jnp.float32)
    w = jnp.asarray(res.w[: res.ndgnh], jnp.float32)
    NP = res.NP

    @jax.jit
    def wind_inv(dense_uv, fl, bt, tables):
        four = legendre_matmul.inv_dense(dense_uv, fl, precision="highest")
        four = four * tables.racthe[None, None, None, :]
        four = jax.lax.optimization_barrier(four)
        return fourier.synthesis_bucketed(four, bt)

    # analysis kept a separate program (production's miscompile guard)
    @jax.jit
    def wind_ana(grid, bt):
        return fourier.analysis_bucketed(grid, bt, res.M)

    @jax.jit
    def wind_dirlt(four, fl, w, tables):
        four = four * tables.racthe[None, None, None, :]
        return legendre_matmul.dir_dense(four, fl, w, NP,
                                         precision="highest")

    guv = wind_inv(dense_uv32, fl, bt, tables)
    np.asarray(guv.ravel()[:1])
    four2 = wind_ana(guv, bt)
    duv2 = wind_dirlt(four2, fl, w, tables)
    duv2h = np.asarray(duv2, np.float64)

    # ---- B: exact host UVTVD on the roundtripped winds ----
    tu64 = spectral.uvtvd_coeff_tables(res, np.float64)
    vor_b, div_b = host_uvtvd(duv2h[:NUV], duv2h[NUV:], tu64)
    emit("B_repr_floor", errs(host_d2p(vor_b, res), host_d2p(div_b, res)))

    # ---- C: device fp32 UVTVD on the same winds ----
    ct = T._coeff_tables(res, "float32")

    @jax.jit
    def dev_uvtvd(duv, ct):
        return spectral.uv_to_vordiv(duv[:NUV], duv[NUV:], ct)

    vor_c, div_c = dev_uvtvd(duv2, ct["uvtvd"])
    dvc = np.asarray(vor_c, np.float64)
    ddc = np.asarray(div_c, np.float64)
    emit("C_fp32_uvtvd", errs(host_d2p(dvc, res), host_d2p(ddc, res)))

    # ---- reference: scalar floor at the same field count ----
    spsc = packed(2 * NUV)
    g2 = et.inv_trans(res, spscalar=jnp.asarray(spsc))
    _, _, ss = et.dir_trans(res, scalars=g2)
    d = np.abs(np.asarray(ss, np.float64) - spsc)
    emit("scalar_floor", float(d.max()))


if __name__ == "__main__":
    main()
