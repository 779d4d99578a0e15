"""On-TPU miscompile regression self-test (VERDICT round-2 item 7).

The axon TPU backend has produced silent wrong results for several fusion
patterns that are exact on CPU (see .claude/skills/verify/SKILL.md).  The
in-tree workarounds (optimization barriers, reshape-based pairing, the
two-program direct transform) are load-bearing, but the unit suite runs on
CPU where the miscompiles never fire.  This script executes each documented
pattern ON DEVICE and compares against a NumPy/CPU ground truth, so a
backend update that re-breaks a pattern is caught before it silently
corrupts production transforms.

Patterns covered:
  1. strided field slice x[0::2]/x[1::2] at >= 5 pairs on large arrays
  2. reversed-latitude slice fused into a batched matmul (nfld >= 3)
  3. 3-array field concat feeding bucketed per-latitude row slices
  4. lax.map chunk lowering
  5. whole-grid RMS normalize broadcast around a bucketed call shape
  6. pallas grouped Legendre kernels vs the XLA einsum path (new round 3)
  7. end-to-end O48 roundtrip at 100*eps

Exit code 0 = all pass.  Run:  python tools/tpu_selftest.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

FAILURES = []


def check(name, got, want, tol):
    got = np.asarray(got)
    want = np.asarray(want)
    err = float(np.max(np.abs(got - want)))
    scale = float(np.max(np.abs(want))) or 1.0
    ok = np.isfinite(err) and err <= tol * scale
    print(f"{'PASS' if ok else 'FAIL'}  {name}: err={err:.3e} "
          f"(tol {tol:.1e} rel, scale {scale:.2e})")
    if not ok:
        FAILURES.append(name)


def t1_strided_slice():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((12, 2, 640, 2560)).astype(np.float32)
    d = jnp.asarray(x)

    @jax.jit
    def f(d):
        ev, od = d[0::2], d[1::2]
        return ev * 2.0 + od

    check("strided field slice >=5 pairs", f(d), x[0::2] * 2 + x[1::2], 1e-6)


def t2_reversed_slice_matmul():
    rng = np.random.default_rng(1)
    p = rng.standard_normal((64, 320, 161)).astype(np.float32)
    s = rng.standard_normal((6, 2, 64, 161)).astype(np.float32)

    @jax.jit
    def f(p, s):
        fs = jnp.einsum("mik,fcmk->fcmi", p, s,
                        precision=jax.lax.Precision.HIGHEST)
        return fs[..., ::-1]  # reversed-latitude slice after batched matmul

    want = np.einsum("mik,fcmk->fcmi", p.astype(np.float64),
                     s.astype(np.float64))[..., ::-1]
    check("reversed-slice + batched matmul", f(jnp.asarray(p), jnp.asarray(s)),
          want, 1e-5)


def t3_concat_row_slices():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((4, 320, 512)).astype(np.float32)
    b = rng.standard_normal((4, 320, 512)).astype(np.float32)
    c = rng.standard_normal((4, 320, 512)).astype(np.float32)

    @jax.jit
    def f(a, b, c):
        x = jnp.concatenate([a, b, c], axis=0)
        # bucketed-style per-latitude row slices + per-bucket reduce
        out = []
        for i0, i1 in ((0, 80), (80, 200), (200, 320)):
            rows = x[:, i0:i1, :]
            out.append(jnp.sum(rows * 1.5, axis=1))
        return jnp.stack(out)

    xn = np.concatenate([a, b, c], axis=0)
    want = np.stack([np.sum(xn[:, i0:i1, :] * 1.5, axis=1)
                     for i0, i1 in ((0, 80), (80, 200), (200, 320))])
    check("3-array concat + bucketed row slices",
          f(*map(jnp.asarray, (a, b, c))), want, 1e-5)


def t4_lax_map():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 256, 512)).astype(np.float32)

    @jax.jit
    def f(x):
        return jax.lax.map(lambda c: jnp.tanh(c) * 2.0, x)

    check("lax.map chunk lowering", f(jnp.asarray(x)), np.tanh(x) * 2.0, 1e-5)


def t5_rms_normalize_broadcast():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((10, 2, 320, 1024)).astype(np.float32)

    @jax.jit
    def f(x):
        s = jax.lax.rsqrt(jnp.mean(x * x, axis=(-2, -1), keepdims=True) + 1e-9)
        y = x * s
        parts = [jnp.sum(y[:, :, i0:i1, :], axis=2)
                 for i0, i1 in ((0, 64), (64, 320))]
        return jnp.concatenate(parts, axis=-1) / s[..., 0]

    s = 1.0 / np.sqrt(np.mean(x * x, axis=(-2, -1), keepdims=True) + 1e-9)
    y = x * s
    want = np.concatenate([np.sum(y[:, :, 0:64, :], axis=2),
                           np.sum(y[:, :, 64:320, :], axis=2)], axis=-1) / s[..., 0]
    check("whole-grid RMS normalize broadcast", f(jnp.asarray(x)), want, 1e-4)


def t8_limb_split_fold():
    """XLA excess-precision folding: x - f32(bf16(x)) is simplified away
    inside larger programs (the bf16 rounding is elided), so cast-based
    limb splits silently collapse to a single bf16 limb.  The production
    splitter (legendre_planes.split_planes) uses bitwise mantissa masking,
    which must stay exact under jit; the cast-based form is checked too so
    a behaviour CHANGE of the backend is visible either way."""
    from ectrans_tpu.ops.legendre_planes import split_planes

    rng = np.random.default_rng(7)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    t = rng.standard_normal((512, 128)).astype(np.float32)

    @jax.jit
    def f(x, t):
        limbs = split_planes(x, 3)
        acc = None
        for l in limbs:
            d = jax.lax.dot_general(
                l, t.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        return acc

    want = x.astype(np.float64) @ np.asarray(
        jnp.asarray(t).astype(jnp.bfloat16).astype(jnp.float32),
        np.float64)
    check("mask-based limb split under jit", f(jnp.asarray(x), jnp.asarray(t)),
          want, 1e-6)


def quick() -> list:
    """Cheap jit-only miscompile patterns (no grid setup, no pallas):
    run by bench.py before every benchmark so each BENCH_r*.json certifies
    the backend workarounds still hold.  Runs t1/t2/t3/t5/t8 only (the
    lax.map pattern — known-broken on axon, never used by production
    code — is exercised by the full suite, not by this quick gate).
    Returns the failure list."""
    FAILURES.clear()
    t1_strided_slice()
    t2_reversed_slice_matmul()
    t3_concat_row_slices()
    t5_rms_normalize_broadcast()
    t8_limb_split_fold()
    return list(FAILURES)


def t6_pallas_legendre(res):
    from ectrans_tpu.ops import legendre_matmul, legendre_pallas

    interp = not legendre_pallas.supported()  # CPU harness check only
    gl = res.grouped_legendre("float32")
    rng = np.random.default_rng(5)
    shape = (5, 2, res.M, res.kmax)
    sym = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    asym = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = np.asarray(legendre_matmul.legendre_inv_grouped(sym, asym, gl))
    for mode, tol in (("bf16x6", 2e-6), ("bf16x3", 2e-5), ("bf16", 2e-2)):
        out = legendre_pallas.legendre_inv_grouped(sym, asym, gl, mode=mode,
                                                   interpret=interp)
        check(f"pallas inv LT [{mode}]", out, ref, tol)
    w = jnp.asarray(res.w[: res.ndgnh], jnp.float32)
    four = jnp.asarray(
        rng.standard_normal((4, 2, res.M, res.ndgl)), jnp.float32)
    rs, ra = legendre_matmul.legendre_dir_grouped(four, gl, w)
    for mode, tol in (("bf16x6", 2e-6), ("bf16x3", 2e-5)):
        s, a = legendre_pallas.legendre_dir_grouped(four, gl, w, mode=mode,
                                                    interpret=interp)
        check(f"pallas dir LT sym [{mode}]", s, np.asarray(rs), tol)
        check(f"pallas dir LT asym [{mode}]", a, np.asarray(ra), tol)


def t7_roundtrip(res):
    import ectrans_tpu as et

    rng = np.random.default_rng(6)
    sc = rng.standard_normal((4, res.nspec2)).astype(np.float32)
    sc[:, 1 : 2 * (res.nsmax + 1) : 2] = 0
    grid = et.inv_trans(res, spscalar=jnp.asarray(sc))
    _, _, sc2 = et.dir_trans(res, scalars=grid)
    check("O48 end-to-end roundtrip (100*eps gate)", sc2, sc,
          100 * float(np.finfo(np.float32).eps))


def main():
    backend = jax.default_backend()
    print(f"# backend: {backend}; devices: {jax.devices()}")
    if backend not in ("tpu", "axon"):
        print("WARNING: not running on a TPU backend — miscompile patterns "
              "will not fire; this run only validates the harness.")
    import ectrans_tpu as et

    res = et.setup("O48", 47)
    t1_strided_slice()
    t2_reversed_slice_matmul()
    t3_concat_row_slices()
    t4_lax_map()
    t5_rms_normalize_broadcast()
    t6_pallas_legendre(res)
    t7_roundtrip(res)
    t8_limb_split_fold()
    if FAILURES:
        print(f"\n{len(FAILURES)} FAILED: {FAILURES}")
        print("NB: failures here mean the backend miscompiles the pattern — "
              "check that the in-tree workarounds still cover the production "
              "paths (see .claude/skills/verify/SKILL.md).")
        sys.exit(1)
    print("\nall patterns pass on this backend")


if __name__ == "__main__":
    main()
