"""Benchmark: inverse+direct spectral-transform round trip throughput.

Mirrors the reference benchmark driver (``src/programs/ectrans-benchmark.F90``:
timed inv_trans/dir_trans loop with analytic correctness gating) on one TPU
chip.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "gridpoints/s/chip", "vs_baseline": N}

Config mirrors the BASELINE.json target ladder: tries TCO1279 (O1280 grid,
the reference's headline resolution), falls back to TCO639 if the chip can't
hold the dense Legendre tensors.  Throughput counts grid points x fields per
transform pair per second.

Correctness gate: the reference gates at ncheck*eps with ncheck=100 in ctest
(``ectrans-benchmark.F90:850-860``, ``tests/CMakeLists.txt:262``); we apply
the same 100*eps(fp32) relative gate to the spectral round-trip error.

Baseline note: the reference publishes no absolute numbers and its Fortran
binaries cannot be built in this image (no Fortran compiler — see
BASELINE.md).  ``vs_baseline`` is therefore anchored to this framework's
round-1 measured throughput; the roofline fields (``legendre_mxu_frac``,
phase breakdown) anchor the result against the hardware limit instead.

Timing on the axon backend: ``block_until_ready`` is unreliable for small
kernels, so phase timings chain N data-dependent calls and force ONE
device->host fetch, subtracting the measured tunnel RTT.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

NFLD_SC = 6
NFLD_UV = 2
ITERS = 10
WARMUP = 2

# vs_baseline anchor: this framework's round-1 measurement (see BASELINE.md;
# the reference binaries are unbuildable here and publish no numbers).
BASELINE_GPPS = {"TCO639": 2.13e8, "TCO1279": 1.78e8}

PEAK_BF16 = 197e12   # TPU v5e MXU peak, bf16 FLOP/s
FP32_PASSES = 6      # Precision.HIGHEST fp32 matmul = 6 bf16 MXU passes
# bf16 MXU passes per fp32 FLOP of the LEGENDRE layer at each public tier
TIER_PASSES = {"highest": 6, "high": 3, "bf16": 1}
# Default tier "highest" (full fp32 everywhere): measured at TCO1279 the
# Legendre layer is table-stream-bound (99-154 GB/s of fp32 table reads,
# dominated by DMA/glue rather than MXU passes — see legendre_pallas.py),
# so 6-pass vs 3-pass MXU costs the same wall time (0.162 vs 0.163
# s/roundtrip) — full precision is free.  The "high" tier also FAILS the
# all-field 100*eps gate at TCO1279 (vor/div UVTVD n-amplification: 2e-3
# vs gate 6.3e-5), so there is no reason to run it on this hardware.
PRECISION = os.environ.get("ECTRANS_BENCH_PRECISION", "highest")


def _rtt(x_dev):
    """Measured device->host fetch latency for a tiny ready array."""
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(x_dev)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _chain_time(fn, args, iters, rtt):
    """Time fn by chaining data-dependent calls + one 1-element fetch."""
    import jax.numpy as jnp

    out = fn(*args)  # warm/compile
    first = out[0] if isinstance(out, tuple) else out
    np.asarray(first.ravel()[:1])
    x = args
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(*x)
        if not isinstance(x, tuple):
            x = (x,)
    first = x[0]
    np.asarray(first.ravel()[:1])
    return max(0.0, (time.perf_counter() - t0 - rtt)) / iters


def _legendre_flops_per_dir(res, gl, nfld):
    """(padded, logical) FLOPs of one grouped Legendre pass at nfld fields."""
    padded = 0
    for g in gl.groups:
        ig = res.ndgnh - g.i0
        kg = g.kg if hasattr(g, "kg") else g.J // 2
        padded += (g.m1 - g.m0) * ig * kg
    padded *= 2 * 2 * 2 * nfld  # FMA x (re,im) x (sym+asym einsums) x fields
    logical = 0
    for m in range(res.M):
        logical += int(res.ndglu[m]) * (res.nsmax - m + 2)
    logical *= 2 * 2 * nfld     # FMA x (re,im); sym+asym together cover n
    return padded, logical


def _stage_time(fn, iters, rtt, x, *extra):
    """Chained wall time of fn(x, *extra): a non-foldable scalar dependency
    (d*1e-30 added to x) serialises iterations; one 1-element fetch ends the
    chain (block_until_ready is unreliable on axon — see BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(d, x, *extra):
        out = fn(x + d.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), *extra)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
        return s * jnp.float32(1e-30)

    d = jnp.zeros((), jnp.float32)
    d = step(d, x, *extra)
    np.asarray(d)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        d = step(d, x, *extra)
    np.asarray(d)
    return max(0.0, time.perf_counter() - t0 - rtt) / iters


def stage_profile(res, dtype="float32"):
    """Attribute the non-Legendre/non-FFT ('other') time: per-stage chained
    timings of every layout/spectral/elementwise stage of the round trip at
    the bench's field counts (VDTUV/SPNSDE/FSC and the packed<->dense<->
    parity relayouts, reference trmtol_pack_unpack.F90 analogues)."""
    import jax
    import jax.numpy as jnp

    from ectrans_tpu.ops import layout, spectral
    from ectrans_tpu import transform as T

    dt = jnp.dtype(dtype)
    tables = res.device_tables(dt)
    ct = T._coeff_tables(res, str(dt))
    rng = np.random.default_rng(2)
    M, NP, K, ndgl = res.M, res.NP, res.kmax, res.ndgl
    F_packed = 2 * NFLD_UV + NFLD_SC           # 10 packed spectral fields
    F_lt = 2 * NFLD_UV + 2 * NFLD_SC           # 16 through the inverse LT
    F_out = 2 * NFLD_UV + 3 * NFLD_SC + 2 * NFLD_UV  # 26 synthesis fields

    def rnd(*shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    spec = rnd(F_packed, res.nspec2)
    dense_uv = rnd(NFLD_UV, 2, M, NP)
    dense_sc = rnd(NFLD_SC, 2, M, NP)
    dense_lt = rnd(F_lt, 2, M, NP)
    dense_dir = rnd(F_packed, 2, M, NP)
    four_lt = rnd(F_lt, 2, M, ndgl)
    sym = rnd(F_packed, 2, M, K)

    rtt = _rtt(jnp.zeros((1,), dt))
    it = 6

    def fsc_concat(four_all, racthe):
        # the inverse FSC stage: slice + 1/(a cos) scalings + E-W derivs +
        # output-group concat (transform._inv_impl after the LT)
        r = racthe[None, None, None, :]
        uvf = four_all[: 2 * NFLD_UV] * r
        scf = four_all[2 * NFLD_UV : 2 * NFLD_UV + NFLD_SC]
        nsdf = four_all[2 * NFLD_UV + NFLD_SC :] * r
        return jnp.concatenate(
            [uvf, scf, nsdf, T._ew_derivative(uvf, r),
             T._ew_derivative(scf, r)], axis=0)

    stages = {
        "packed_to_dense": _stage_time(
            layout.packed_to_dense, it, rtt, spec, tables),
        "vdtuv": _stage_time(
            lambda v, d, t: spectral.vordiv_to_uv(v, d, t), it, rtt,
            dense_uv, dense_uv, ct["vd"]),
        "spnsde": _stage_time(
            spectral.ns_derivative, it, rtt, dense_sc, ct["nsd"]),
        "fsc_ew_concat": _stage_time(
            fsc_concat, it, rtt, four_lt, tables.racthe),
        "uvtvd": _stage_time(
            lambda u, v, t: spectral.uv_to_vordiv(u, v, t), it, rtt,
            dense_uv, dense_uv, ct["uvtvd"]),
        "dense_to_packed": _stage_time(
            layout.dense_to_packed, it, rtt, dense_dir, tables),
    }
    from ectrans_tpu.ops import legendre_matmul as _lm
    from ectrans_tpu.ops import pack_pallas as _pk

    if _pk.supported():
        # the production packed-output route (compaction kernel incl. the
        # realign+transpose front); the XLA gather it replaced is timed
        # under an explicit "_replaced" suffix so the artifact says which
        # stage the roundtrip actually contains
        stages["dense_to_packed_xla_replaced"] = stages.pop("dense_to_packed")
        plan = _pk.plan_for(res)
        stages["pack_kernel_live"] = _stage_time(
            lambda x, p: _pk.dense_to_packed(x, p), it, rtt,
            dense_dir, plan)
    if _lm.engine(PRECISION) != "dense":
        # parity relayouts exist only on the einsum engines' hot path
        stages["dense_to_parity"] = _stage_time(
            layout.dense_to_parity, it, rtt, dense_lt, tables)
        stages["parity_to_dense"] = _stage_time(
            lambda s, t: layout.parity_to_dense(s, s, t, NP), it, rtt,
            sym, tables)
    return {k: round(v * 1e3, 2) for k, v in stages.items()}


def phase_profile(res, dtype="float32"):
    """Per-phase chained timings + Legendre MXU utilization at the bench's
    field counts (inv: 16 fields through LT, 26 through synthesis;
    dir: 10 through analysis and LT)."""
    import jax
    import jax.numpy as jnp

    from ectrans_tpu.ops import fourier, legendre_matmul

    eng = legendre_matmul.engine(PRECISION)
    tdt = ("bfloat16" if PRECISION == "bf16" else str(jnp.dtype(dtype)))
    if eng == "planes":
        from ectrans_tpu.ops import legendre_planes

        gl = res.planes_legendre(legendre_planes.planes_for_tier(PRECISION))
    elif eng == "dense":
        gl = res.full_legendre(tdt)
    else:
        gl = res.grouped_legendre(tdt)
    bt = fourier.bucketed_tables_for(res, dtype)
    w = jnp.asarray(res.w[: res.ndgnh], dtype)
    NP = res.NP
    rng = np.random.default_rng(1)

    @jax.jit
    def leg_pair(sym, asym, gl, w):
        if eng == "planes":
            four = legendre_matmul.inv_planes(sym, gl, precision=PRECISION)
            return (legendre_matmul.dir_planes(four, gl, w, NP,
                                               precision=PRECISION), asym)
        if eng == "dense":
            # sym here is the dense spectral tensor; asym is a dummy kept
            # so the chained-args signature matches the parity branch
            four = legendre_matmul.inv_dense(sym, gl, precision=PRECISION)
            return (legendre_matmul.dir_dense(four, gl, w, NP,
                                              precision=PRECISION), asym)
        four = legendre_matmul.inv_grouped(sym, asym, gl, precision=PRECISION)
        return legendre_matmul.dir_grouped(four, gl, w, precision=PRECISION)

    @jax.jit
    def fft_pair(four, bt):
        grid = fourier.synthesis_bucketed(four, bt, prec=PRECISION)
        return fourier.analysis_bucketed(grid, bt, four.shape[2],
                                         prec=PRECISION)

    def sym_in(F):
        if eng in ("dense", "planes"):
            return (
                jnp.asarray(rng.standard_normal((F, 2, res.M, NP)), dtype),
                jnp.zeros((1,), dtype),
            )
        return (
            jnp.asarray(rng.standard_normal((F, 2, res.M, res.kmax)), dtype),
            jnp.asarray(rng.standard_normal((F, 2, res.M, res.kmax)), dtype),
        )

    def four_in(F):
        return (jnp.asarray(
            rng.standard_normal((F, 2, res.M, res.ndgl)), dtype),)

    rtt = _rtt(jnp.zeros((1,), dtype))
    iters = 6
    F_lt_inv = 2 * NFLD_UV + 2 * NFLD_SC        # uv + sc + nsd through LT
    F_syn = 2 * NFLD_UV + NFLD_SC + NFLD_SC + 2 * NFLD_UV + NFLD_SC  # 26
    F_dir = 2 * NFLD_UV + NFLD_SC               # 10

    t_leg_inv = _chain_time(lambda s, a: leg_pair(s, a, gl, w),
                            sym_in(F_lt_inv), iters, rtt) / 2
    t_leg_dir = _chain_time(lambda s, a: leg_pair(s, a, gl, w),
                            sym_in(F_dir), iters, rtt) / 2
    t_syn = _chain_time(lambda f: fft_pair(f, bt),
                        four_in(F_syn), iters, rtt) / 2
    t_ana = _chain_time(lambda f: fft_pair(f, bt),
                        four_in(F_dir), iters, rtt) / 2

    pad_i, log_i = _legendre_flops_per_dir(res, gl, F_lt_inv)
    pad_d, log_d = _legendre_flops_per_dir(res, gl, F_dir)
    t_leg = t_leg_inv + t_leg_dir
    # pass counts model the dense/parity kernels; the planes engine streams
    # nplanes bf16 table planes with row-packed limbs instead of full
    # fp32-split passes, so derive its pass count from nplanes
    if eng == "planes":
        from ectrans_tpu.ops import legendre_planes as _lp

        tier_passes = _lp.planes_for_tier(PRECISION)
    else:
        tier_passes = TIER_PASSES[PRECISION]
    mxu_frac = (pad_i + pad_d) * FP32_PASSES / (t_leg * PEAK_BF16)
    mxu_frac_tier = (pad_i + pad_d) * tier_passes / (t_leg * PEAK_BF16)
    mfu_logical = (log_i + log_d) / (t_leg * PEAK_BF16)
    # measured table-stream bandwidth: each direction reads the full
    # stored table set exactly once (dense/planes/grouped alike), so
    # bytes/s = stored-table bytes / per-direction wall time — the
    # demonstrated (not asserted) HBM bound of the layer
    tbl_bytes = sum(l.size * l.dtype.itemsize
                    for l in jax.tree_util.tree_leaves(gl))
    return {
        "legendre_inv_ms": round(t_leg_inv * 1e3, 2),
        "legendre_dir_ms": round(t_leg_dir * 1e3, 2),
        "legendre_table_gib": round(tbl_bytes / 2**30, 2),
        "legendre_inv_gbps": round(tbl_bytes / t_leg_inv / 1e9, 1),
        "legendre_dir_gbps": round(tbl_bytes / t_leg_dir / 1e9, 1),
        "fourier_syn_ms": round(t_syn * 1e3, 2),
        "fourier_ana_ms": round(t_ana * 1e3, 2),
        "legendre_mxu_frac": round(mxu_frac, 4),
        "legendre_mxu_frac_tier": round(mxu_frac_tier, 4),
        "precision_tier": PRECISION,
        "leg_kernel": os.environ.get("ECTRANS_TPU_LEG_KERNEL", "auto"),
        "legendre_mfu_logical": round(mfu_logical, 4),
        "legendre_tflops_padded": round((pad_i + pad_d) / t_leg / 1e12, 2),
    }


def run(config: str, profile_phases: bool, deadline: float | None = None):
    import jax
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.transform import InvFlags

    t_setup = time.perf_counter()
    res = et.setup(config)
    print(f"# {config} setup {time.perf_counter()-t_setup:.0f}s",
          file=sys.stderr, flush=True)
    flags = InvFlags(scders=True, uvders=True)
    rng = np.random.default_rng(0)

    def packed(n):
        x = rng.standard_normal((n, res.nspec2)).astype(np.float32)
        x[:, 1 : 2 * (res.nsmax + 1) : 2] = 0.0
        x[:, 0] = 0.0
        return jnp.asarray(x)

    spvor, spdiv, spsc = packed(NFLD_UV), packed(NFLD_UV), packed(NFLD_SC)

    # NB: no outer jax.jit — inv_trans/dir_trans are jitted internally with
    # the precomputed tables passed as arguments (an outer jit would inline
    # the tables into the HLO as multi-GB constants).
    def step(spvor, spdiv, spsc):
        grid = et.inv_trans(res, spvor=spvor, spdiv=spdiv, spscalar=spsc,
                            flags=flags, precision=PRECISION)
        u = grid[0:NFLD_UV]
        v = grid[NFLD_UV : 2 * NFLD_UV]
        sc = grid[2 * NFLD_UV : 2 * NFLD_UV + NFLD_SC]
        return et.dir_trans(res, u=u, v=v, scalars=sc, precision=PRECISION)

    # Warmup MUST end in a device->host fetch: on axon block_until_ready
    # returns before remote compile/execution finish, so a block-only warmup
    # leaks ~50 s of compile into the first timed loop (round-1's numbers
    # were dispatch-only for this reason — see BASELINE.md).
    for _ in range(WARMUP):
        out = step(spvor, spdiv, spsc)
    np.asarray(out[2].ravel()[:1])

    # correctness gate at the reference's ctest multiple: 100*eps relative
    # (--check 100, ectrans-benchmark.F90:850-860) over EVERY field family
    # — vor/div included (their UVTVD n-amplification is the binding
    # constraint at reduced precision).  The (m=0, n=0) coefficient of
    # vor/div carries no wind information (reference UVTVD also returns 0
    # there) and is excluded.  The bf16 tier uses the reference's own
    # relaxed FLT precedent (1e6*eps, tests/CMakeLists.txt:316).
    ncheck = 1e6 if PRECISION == "bf16" else 100
    err, gate, worst = 0.0, 1.0, 0.0
    for got, ref in zip(out, (spvor, spdiv, spsc)):
        d = np.abs(np.asarray(got) - np.asarray(ref))
        if ref is not spsc:
            d[:, :2] = 0.0
        e, s = float(d.max()), float(jnp.max(jnp.abs(ref)))
        g = ncheck * float(np.finfo(np.float32).eps) * s
        if not np.isfinite(e) or e / g > worst:
            err, gate, worst = e, g, e / g if np.isfinite(e) else np.inf
    if not np.isfinite(err) or err > gate:
        raise RuntimeError(
            f"correctness gate failed: err {err} > {ncheck:g}*eps*max = {gate}")

    # steady-state pre-loop (first post-compile executions run ~2x slower)
    for _ in range(3):
        out = step(spvor, spdiv, spsc)
    np.asarray(out[2].ravel()[:1])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(spvor, spdiv, spsc)
    jax.block_until_ready(out)
    np.asarray(out[2].ravel()[:1])  # force a real fetch (axon deferred exec)
    dt = (time.perf_counter() - t0) / ITERS

    # per-iteration variance (reference prints min/avg/max per transform,
    # ectrans-benchmark.F90:920-945): each iteration fetch-synced, tunnel
    # RTT subtracted; the headline dt stays the pipelined loop above so
    # rounds remain comparable.
    rtt = _rtt(out[2].ravel()[:1])
    iter_s = []
    for _ in range(5):
        t1 = time.perf_counter()
        out = step(spvor, spdiv, spsc)
        np.asarray(out[2].ravel()[:1])
        iter_s.append(time.perf_counter() - t1 - rtt)
    variance = {
        "min_ms": round(min(iter_s) * 1e3, 1),
        "avg_ms": round(sum(iter_s) / len(iter_s) * 1e3, 1),
        "max_ms": round(max(iter_s) * 1e3, 1),
        "n": len(iter_s),
    }

    nfld_total = 2 * NFLD_UV + NFLD_SC  # u, v, scalars transformed both ways
    gpps = res.grid.ngptot * nfld_total / dt
    # profiling must never discard a completed headline measurement, and
    # must never eat the driver's whole budget (the headline JSON matters
    # more than the phase attribution — profiling compiles ~10 programs)
    remaining = (deadline - time.time()) if deadline else float("inf")
    phases = None
    try:
        if profile_phases and remaining > 300:
            phases = phase_profile(res)
            remaining = (deadline - time.time()) if deadline else float("inf")
            if remaining > 300 and os.environ.get(
                    "ECTRANS_BENCH_STAGES", "1") != "0":
                phases["stages_ms"] = stage_profile(res)
            elif remaining <= 300:
                print("# skipping stage profile: bench time budget",
                      file=sys.stderr)
        elif profile_phases:
            print("# skipping phase profile: bench time budget",
                  file=sys.stderr)
    except Exception as e:
        print(f"# phase profiling failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    return gpps, dt, err, gate, phases, variance


def _selftest() -> str:
    """Cheap on-chip miscompile patterns (tools/tpu_selftest.quick) so
    every BENCH_r*.json certifies the backend workarounds still hold.
    'pass', 'FAIL:[...]', or 'skipped'."""
    if os.environ.get("ECTRANS_BENCH_SELFTEST", "1") == "0":
        return "skipped"
    try:
        import importlib.util

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", "tpu_selftest.py")
        spec = importlib.util.spec_from_file_location("tpu_selftest", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fails = mod.quick()
        return "pass" if not fails else f"FAIL:{fails}"
    except Exception as e:  # never kill the headline for the certificate
        return f"error:{type(e).__name__}"


def main():
    import time as _t

    # the legpol setup product persists across bench runs in the default
    # on-disk cache (~/.cache/ectrans_tpu/legpol) — the TCO1279 host table
    # build is a cache load, not a 10-minute recurrence (see cache.py)
    budget = float(os.environ.get("ECTRANS_BENCH_BUDGET_S", "1500"))
    # headline config FIRST: the driver's budget must always capture TCO1279
    # (the reference's own headline resolution, ectrans-benchmark.F90 O1280)
    order = os.environ.get("ECTRANS_BENCH_CONFIGS", "TCO1279,TCO639").split(",")
    want_phases = os.environ.get("ECTRANS_BENCH_PHASES", "1") != "0"
    t0 = _t.time()
    results = {}
    for i, config in enumerate(order):
        if results and (budget - (_t.time() - t0)) < 420:
            print(f"# skipping {config}: bench time budget", file=sys.stderr)
            break
        try:
            # phase profiling only for the headline (first) config
            results[config] = run(config, want_phases and i == 0,
                                  deadline=t0 + budget)
        except Exception as e:  # OOM / compile failure: keep earlier result
            print(f"# {config} failed: {type(e).__name__}: {e}", file=sys.stderr)
    if not results:
        raise SystemExit(1)
    # report the headline = first configured entry that succeeded
    config = next(c for c in order if c in results)
    gpps, dt, err, gate, phases, variance = results[config]
    import resource

    detail = {
        "sec_per_roundtrip": round(dt, 4),
        # which timing the headline derives from (reference prints all four
        # stats labeled, ectrans-benchmark.F90:920-945): sec_per_roundtrip
        # (and "value") come from the PIPELINED loop (ITERS in-flight
        # roundtrips, one final fetch) — the throughput metric; the
        # fetch-synced per-iteration latency is "roundtrip_ms" min/avg/max
        "timing_method": "headline value + sec_per_roundtrip = pipelined "
                         "loop (throughput); roundtrip_ms = fetch-synced "
                         "per-iteration latency (min/avg/max)",
        # reference ectrans_memory peak-heap analogue (util/ectrans_memory.c)
        "host_peak_rss_mib": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**10),
        "nfld": 2 * NFLD_UV + NFLD_SC,
        "roundtrip_err": err,
        "err_gate_100eps": gate,
        "baseline_def": "round-1 measurement of this framework (reference "
                        "binaries unbuildable: no Fortran compiler; see BASELINE.md)",
        "all": {k: round(v[0], 1) for k, v in results.items()},
        "roundtrip_ms": variance,
        "selftest": _selftest(),
    }
    if phases:
        known = (phases["legendre_inv_ms"] + phases["legendre_dir_ms"]
                 + phases["fourier_syn_ms"] + phases["fourier_ana_ms"])
        phases["other_ms"] = round(dt * 1e3 - known, 2)
        phases["fft_share"] = round(
            (phases["fourier_syn_ms"] + phases["fourier_ana_ms"]) / (dt * 1e3), 3)
        detail["phases"] = phases
    print(
        json.dumps(
            {
                "metric": f"{config} inv+dir roundtrip throughput",
                "value": round(gpps, 1),
                "unit": "gridpoints/s/chip",
                "vs_baseline": round(gpps / BASELINE_GPPS[config], 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
