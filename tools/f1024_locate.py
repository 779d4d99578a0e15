"""Localize the F1024/T2047 on-chip correctness failure (round 4).

CPU passes clean (3.8e-6), so the defect is TPU-path-specific.  Two
probes, cheapest-first:

1. tablegen spot-check: materialize the F1024 tables on device and fetch
   a few rows for m in {0, mid, high}, comparing against the host fp64
   legpol cache (already on disk) — tests the recurrence at chain length
   ~2050 without running a transform.
2. roundtrip with ECTRANS_TPU_LEG_KERNEL=xla (device tables + XLA
   einsums) — if 1 is clean and this passes, the dense Pallas kernels
   at F1024 shapes are the defect; if this fails too, the Fourier layer
   at ndlon 4096 joins the suspect list.

Run on the chip:  python tools/f1024_locate.py [probe1|probe2|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe1(res):
    import jax

    from ectrans_tpu.ops import legendre_tablegen

    os.environ.pop("ECTRANS_TPU_TABLE_SOURCE", None)
    gen = legendre_tablegen.materialize_full_legendre(res, "float32",
                                                      ngroups=16)
    # host truth from the parity cache (fp64 -> fp32): row n of m is
    # psym[m, :, (n-m)//2] / pasym for odd n-m
    psym, pasym = res.parity_tables("float32")
    worst = 0.0
    for g in gen.groups:
        gm = g.m1 - g.m0
        for mloc in (0, gm // 2, gm - 1):
            m = g.m0 + mloc
            for j in (0, 1, g.J // 2, g.J - 2, g.J - 1):
                row = np.asarray(g.pn[mloc, j, :])            # (ig,) fetch
                tab = psym if j % 2 == 0 else pasym
                ref = np.asarray(tab[m, g.i0:, j // 2])
                d = np.abs(row - ref).max()
                worst = max(worst, float(d))
                if d > 1e-5:
                    print(f"  BAD m={m} j={j}: maxdiff {d:.3e} "
                          f"(|ref|max {np.abs(ref).max():.3e})", flush=True)
    print(f"probe1 tablegen spot-check worst |diff|: {worst:.3e}",
          flush=True)
    return worst < 1e-5


def probe2(res):
    import jax.numpy as jnp

    import ectrans_tpu as et

    os.environ["ECTRANS_TPU_LEG_KERNEL"] = "xla"
    res.grouped_legendre.cache_clear()
    rng = np.random.default_rng(0)
    sp = rng.standard_normal((2, res.nspec2)).astype(np.float32)
    sp[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
    sp[:, 0] = 0.0
    t0 = time.time()
    g = et.inv_trans(res, spscalar=jnp.asarray(sp))
    out = et.dir_trans(res, scalars=g)[2]
    err = float(np.abs(np.asarray(out) - sp).max())
    print(f"probe2 xla-engine roundtrip err {err:.3e} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return err < 1e-4


def probe3(res):
    """Fourier-layer composition: analysis(synthesis(x)) == x for valid
    coeffs — exact quadrature identity, no layout conventions needed.
    CPU passes the full roundtrip, so a failure here localizes the
    on-chip Fourier path (first-ever F-grid ndlon-4096 single-bucket
    structure on this backend)."""
    import jax
    import jax.numpy as jnp

    from ectrans_tpu.ops import fourier

    bt = fourier.bucketed_tables_for(res, "float32")
    rng = np.random.default_rng(0)
    M, ndgl = res.M, res.ndgl
    x = rng.standard_normal((2, 2, M, ndgl)).astype(np.float32)
    nmen = np.asarray(res.nmen)[None, None, None, :]          # per-lat cut
    mm = np.arange(M)[None, None, :, None]
    x *= (mm <= nmen)
    x[:, 1, 0] = 0.0                                          # m=0 real

    @jax.jit
    def comp(x):
        g = fourier.synthesis_bucketed(x, bt)
        return fourier.analysis_bucketed(g, bt, M)

    t0 = time.time()
    y = np.asarray(comp(jnp.asarray(x)))
    err = np.abs(y - x).max()
    print(f"probe3 fourier synth+ana composition err {err:.3e} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return err < 1e-4


def probe4(res):
    """Legendre-layer composition: dir(inv(x)) == x for spectra with
    n <= nsmax (Gaussian quadrature exactness) through the production
    dense kernels at F1024 shapes."""
    import jax
    import jax.numpy as jnp

    from ectrans_tpu.ops import legendre_matmul

    os.environ.pop("ECTRANS_TPU_TABLE_SOURCE", None)
    fl = res.full_legendre("float32")
    w = jnp.asarray(res.w[: res.ndgnh], jnp.float32)
    M, NP = res.M, res.NP
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2, M, NP)).astype(np.float32)
    nn = np.arange(NP)[None, :]
    mm = np.arange(M)[:, None]
    valid = ((nn >= mm) & (nn <= res.nsmax)).astype(np.float32)
    x *= valid

    @jax.jit
    def comp(x, fl, w):
        # tables as ARGUMENTS, never closures (multi-GB jit constants
        # are rejected by the remote compile — see transform.py)
        four = legendre_matmul.inv_dense(x, fl, precision="highest")
        return legendre_matmul.dir_dense(four, fl, w, NP,
                                         precision="highest")

    t0 = time.time()
    y = np.asarray(comp(jnp.asarray(x), fl, w)) * valid
    err = np.abs(y - x).max()
    print(f"probe4 legendre inv+dir composition err {err:.3e} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return err < 1e-4


def probe5(res):
    """Layout glue: packed -> dense (gather) -> packed (production
    Pallas compaction kernel incl. realign+transpose front) must be the
    identity.  First-ever M=2048/NP=2049 shapes for the pack kernel."""
    import jax
    import jax.numpy as jnp

    from ectrans_tpu.ops import layout, pack_pallas

    tables = res.device_tables(jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, res.nspec2)).astype(np.float32)
    x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0

    @jax.jit
    def comp(x, tables, plan):
        dense = layout.packed_to_dense(x, tables)
        return pack_pallas.dense_to_packed(dense, plan)

    plan = pack_pallas.plan_for(res)
    t0 = time.time()
    y = np.asarray(comp(jnp.asarray(x), tables, plan))
    err = np.abs(y - x).max()
    print(f"probe5 packed->dense->packed composition err {err:.3e} "
          f"({time.time()-t0:.0f}s)", flush=True)
    # also the XLA gather route for comparison
    @jax.jit
    def comp_xla(x, tables):
        dense = layout.packed_to_dense(x, tables)
        return layout.dense_to_packed(dense, tables)

    y2 = np.asarray(comp_xla(jnp.asarray(x), tables))
    err2 = np.abs(y2 - x).max()
    print(f"probe5b xla-gather route composition err {err2:.3e}",
          flush=True)
    return err < 1e-6


def probe6(res):
    """Production-pipeline bisection (round 5: probes 1/3/4/5 ALL pass in
    isolation while the full roundtrip fails at 3.67 — the defect must be
    in a stage combination only the full jit programs contain).  Runs the
    production inv_trans/dir_trans (dense engine) against the SAME stages
    executed as separate jit programs, comparing at each boundary:

      inv:  packed->dense | inv_dense | synthesis_bucketed
      dir:  analysis_bucketed | dir_rows+packed_from_group_rows
            (the production m-major path probe4/probe5 do NOT cover)
    """
    import jax
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.ops import (fourier, layout, legendre_matmul,
                                 pack_pallas)

    os.environ.pop("ECTRANS_TPU_LEG_KERNEL", None)
    rng = np.random.default_rng(0)
    sp = rng.standard_normal((4, res.nspec2)).astype(np.float32)
    sp[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
    sp[:, 0] = 0.0
    spd = jnp.asarray(sp)
    tables = res.device_tables(jnp.float32)
    fl = res.full_legendre("float32")
    bt = fourier.bucketed_tables_for(res, jnp.float32)
    w = jnp.asarray(res.w[: res.ndgnh], jnp.float32)
    scale = float(np.abs(sp).max())

    # --- manual inverse, one jit program per stage ---
    dense = jax.jit(layout.packed_to_dense)(spd, tables)
    np.asarray(dense.ravel()[:1])
    four = jax.jit(functools_partial(legendre_matmul.inv_dense,
                                     precision="highest"))(dense, fl)
    np.asarray(four.ravel()[:1])
    grid_man = jax.jit(functools_partial(fourier.synthesis_bucketed))(four, bt)
    g_man = np.asarray(grid_man)
    print("probe6: manual inverse done", flush=True)

    # --- production inverse (one fused program) ---
    g_prod = np.asarray(et.inv_trans(res, spscalar=spd))
    d_inv = np.abs(g_prod - g_man).max()
    print(f"probe6 inv: |production - staged| = {d_inv:.3e} "
          f"(grid scale {np.abs(g_man).max():.3e})", flush=True)

    # --- manual direct, staged ---
    four2 = jax.jit(functools_partial(fourier.analysis_bucketed, M=res.M))(
        grid_man, bt)
    np.asarray(four2.ravel()[:1])

    pp = pack_pallas.plan_for(res)

    @jax.jit
    def rows_pack(four2, fl, w, pp):
        rows = legendre_matmul.dir_rows(four2, fl, w, precision="highest")
        return pack_pallas.packed_from_group_rows(rows, pp)

    packed_rows = np.asarray(rows_pack(four2, fl, w, pp))
    err_rows = np.abs(packed_rows - sp).max()
    print(f"probe6 dir(rows path, staged): roundtrip err {err_rows:.3e} "
          f"(scale {scale:.3e})", flush=True)

    @jax.jit
    def dense_pack(four2, fl, w, tables):
        d = legendre_matmul.dir_dense(four2, fl, w, res.NP,
                                      precision="highest")
        return layout.dense_to_packed(d, tables)

    packed_dense = np.asarray(dense_pack(four2, fl, w, tables))
    err_dense = np.abs(packed_dense - sp).max()
    print(f"probe6 dir(dense path, staged): roundtrip err {err_dense:.3e}",
          flush=True)

    # --- production direct (fused analysis|lt programs) ---
    out_prod = np.asarray(et.dir_trans(res, scalars=jnp.asarray(g_prod))[2])
    err_prod = np.abs(out_prod - sp).max()
    print(f"probe6 dir(production): roundtrip err {err_prod:.3e}", flush=True)
    return d_inv, err_rows, err_dense, err_prod


def functools_partial(fn, **kw):
    import functools

    return functools.partial(fn, **kw)


def probe7(res):
    """Host-truth verification of EVERY staged device tensor (round 5:
    probe6 showed all three direct variants fail identically at 3.672
    while each kernel passes in isolation — so check each staged device
    stage against absolute host math, each from the previous DEVICE
    output so errors cannot cascade).  F-grid only (uniform nloen) — the
    host DFTs are plain rffts."""
    import jax
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.ops import fourier, layout, legendre_matmul

    os.environ.pop("ECTRANS_TPU_LEG_KERNEL", None)
    rng = np.random.default_rng(0)
    nfld = 4
    sp = rng.standard_normal((nfld, res.nspec2)).astype(np.float32)
    sp[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
    sp[:, 0] = 0.0
    spd = jnp.asarray(sp)
    tables = res.device_tables(jnp.float32)
    fl = res.full_legendre("float32")
    bt = fourier.bucketed_tables_for(res, jnp.float32)
    w = jnp.asarray(res.w[: res.ndgnh], jnp.float32)
    M, NP, ndgl, ndgnh = res.M, res.NP, res.ndgl, res.ndgnh
    L = res.grid.ndlon
    psym, pasym = res.parity_tables("float32")  # (M, ndgnh, kmax)
    K = psym.shape[2]
    wh = np.asarray(res.w[:ndgnh], np.float64)

    def host_p2d(spv):
        dense = np.zeros((nfld, 2, M, NP), np.float64)
        nasm0 = np.asarray(res.nasm0)
        for m in range(M):
            Lm = res.nsmax + 1 - m
            blk = spv[:, nasm0[m] : nasm0[m] + 2 * Lm].reshape(nfld, Lm, 2)
            dense[:, 0, m, m : m + Lm] = blk[..., 0]
            dense[:, 1, m, m : m + Lm] = blk[..., 1]
        return dense

    def rel(name, got, ref):
        scale = max(np.abs(ref).max(), 1e-30)
        d = np.abs(np.asarray(got, np.float64) - ref).max()
        print(f"probe7 {name}: absdiff {d:.3e} relative {d/scale:.3e}",
              flush=True)

    # stage 1: packed -> dense
    dense_d = jax.jit(layout.packed_to_dense)(spd, tables)
    dense_h = np.asarray(dense_d, np.float64)
    rel("packed_to_dense", dense_h, host_p2d(sp.astype(np.float64)))

    # stage 2: inverse LT (dense engine) vs host parity einsum (chunked)
    four_d = jax.jit(functools_partial(legendre_matmul.inv_dense,
                                       precision="highest"))(dense_d, fl)
    four_h = np.asarray(four_d, np.float64)

    def host_lt_inv(dense):
        out = np.zeros((nfld, 2, M, ndgl), np.float64)
        for m0 in range(0, M, 256):
            m1 = min(M, m0 + 256)
            # parity split of the dense rows
            ks = np.arange(K)
            sym = np.zeros((nfld, 2, m1 - m0, K))
            asym = np.zeros((nfld, 2, m1 - m0, K))
            for mi, m in enumerate(range(m0, m1)):
                ns = m + 2 * ks
                oks = ks[ns <= res.nsmax + 1]
                sym[:, :, mi, oks] = dense[:, :, m, m + 2 * oks]
                na = m + 2 * ks + 1
                oka = ks[na <= res.nsmax + 1]
                asym[:, :, mi, oka] = dense[:, :, m, m + 2 * oka + 1]
            ps = np.asarray(psym[m0:m1], np.float64)
            pa = np.asarray(pasym[m0:m1], np.float64)
            fs = np.einsum("mik,fcmk->fcmi", ps, sym, optimize=True)
            fa = np.einsum("mik,fcmk->fcmi", pa, asym, optimize=True)
            out[:, :, m0:m1, :ndgnh] = fs + fa
            out[:, :, m0:m1, ndgnh:] = (fs - fa)[..., ::-1]
        return out

    rel("inv_dense LT", four_h, host_lt_inv(dense_h))

    # stage 3: synthesis vs host irfft (truth from the DEVICE four)
    grid_d = jax.jit(fourier.synthesis_bucketed)(four_d, bt)
    grid_h = np.asarray(grid_d, np.float64)
    H = four_h[:, 0] + 1j * four_h[:, 1]          # (nfld, M, ndgl)
    H = H.transpose(0, 2, 1)                      # (nfld, ndgl, M)
    g_ref = np.fft.irfft(H, n=L, axis=-1) * L
    rel("synthesis", grid_h, g_ref)

    # stage 4: analysis vs host rfft (truth from the DEVICE grid)
    four2_d = jax.jit(functools_partial(fourier.analysis_bucketed, M=M))(
        grid_d, bt)
    four2_h = np.asarray(four2_d, np.float64)
    Z = np.fft.rfft(grid_h, axis=-1)[..., :M] / L  # (nfld, ndgl, M)
    Z = Z.transpose(0, 2, 1)
    f2_ref = np.stack([Z.real, Z.imag], axis=1)
    rel("analysis", four2_h, f2_ref)

    # stage 5: direct LT vs host quadrature (truth from DEVICE four2)
    dir_d = jax.jit(functools_partial(legendre_matmul.dir_dense, NP=NP,
                                      precision="highest"))(four2_d, fl, w)
    dir_h = np.asarray(dir_d, np.float64)

    def host_lt_dir(four):
        north = four[..., :ndgnh]
        south = four[..., : ndgnh - 1 : -1]
        fsym = (north + south) * wh
        fasym = (north - south) * wh
        out = np.zeros((nfld, 2, M, NP), np.float64)
        for m0 in range(0, M, 256):
            m1 = min(M, m0 + 256)
            ps = np.asarray(psym[m0:m1], np.float64)
            pa = np.asarray(pasym[m0:m1], np.float64)
            sym = np.einsum("mik,fcmi->fcmk", ps, fsym[:, :, m0:m1],
                            optimize=True)
            asym = np.einsum("mik,fcmi->fcmk", pa, fasym[:, :, m0:m1],
                             optimize=True)
            for mi, m in enumerate(range(m0, m1)):
                ks = np.arange(K)
                ns = m + 2 * ks
                ok = ks[ns <= res.nsmax + 1]
                out[:, :, m, m + 2 * ok] = sym[:, :, mi, ok]
                na = m + 2 * ks + 1
                ok = ks[na <= res.nsmax + 1]
                out[:, :, m, m + 2 * ok + 1] = asym[:, :, mi, ok]
        return out

    dir_ref = host_lt_dir(four2_h)
    valid = np.zeros((M, NP))
    nn = np.arange(NP)[None, :]
    mm = np.arange(M)[:, None]
    valid[(nn >= mm) & (nn <= res.nsmax)] = 1.0
    rel("dir_dense LT (valid region)", dir_h * valid, dir_ref * valid)

    # end-to-end sanity: host dir_ref packed back vs sp
    sp_ref = np.zeros((nfld, res.nspec2))
    nasm0 = np.asarray(res.nasm0)
    for m in range(M):
        Lm = res.nsmax + 1 - m
        blk = np.stack([dir_ref[:, 0, m, m : m + Lm],
                        dir_ref[:, 1, m, m : m + Lm]], axis=-1)
        sp_ref[:, nasm0[m] : nasm0[m] + 2 * Lm] = blk.reshape(nfld, 2 * Lm)
    d = np.abs(sp_ref - sp)
    print(f"probe7 host-LT(dev four2) roundtrip err {d.max():.3e}",
          flush=True)


def main():
    import ectrans_tpu as et

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    t0 = time.time()
    res = et.setup("F1024", 2047)
    print(f"F1024 setup {time.time()-t0:.0f}s", flush=True)
    if which in ("probe1", "both"):
        probe1(res)
    if which in ("probe3", "both"):
        probe3(res)
    if which in ("probe4", "both"):
        probe4(res)
    if which in ("probe5", "both"):
        probe5(res)
    if which == "probe2":
        probe2(res)
    if which == "probe6":
        probe6(res)
    if which == "probe7":
        probe7(res)


if __name__ == "__main__":
    main()
