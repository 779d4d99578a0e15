"""Sweep ECTRANS_TPU_FFT_BUCKETS at the production fft_pair shapes.

The Fourier layer's one free structural parameter: more latitude buckets
tighten the per-bucket chirp length staircase (each bucket pays
nfft = good_size(max nloen + 2*max nmen) over its rows — the octahedral
nloen slope makes coarse polar buckets overshoot), fewer buckets cut the
per-bucket fixed cost (dispatch, pack/unpack edges).  12 was chosen by
measurement in round 3; this re-measures the staircase on the production
PAIR program (synthesis+analysis fused, the bench's fft_pair — standalone
synthesis programs measure up to 3x slower than the same ops fused, so
only the pair number is production-representative; BASELINE.md round 5).

Run on the chip (idle — contention poisons these numbers):
    python tools/fft_bucket_sweep.py [TCO1279] [counts ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NFLD_SYN = 26
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "evidence", "fft_bucket_sweep.json")
RESULTS = {}


def emit(k, v):
    RESULTS[k] = v
    print(f"{k}: {v}", flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def chain_time(fn, x, iters=6):
    """bench.py's output-feedback chain: the pair's output shape equals
    its input shape, so x = fn(x) is a true data-dependent chain with NO
    eager per-iteration ops (eager chain perturbations measured +200 ms
    of overhead per iteration on the axon dispatch path — only this form
    reproduces the production bench's numbers)."""
    out = fn(x)
    np.asarray(out.ravel()[:1])
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(out.ravel()[:1])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    cur = x
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = fn(cur)
    np.asarray(cur.ravel()[:1])
    return max(0.0, time.perf_counter() - t0 - rtt) / iters


def main():
    import jax
    import jax.numpy as jnp

    import ectrans_tpu as et
    from ectrans_tpu.ops import fourier

    config = sys.argv[1] if len(sys.argv) > 1 else "TCO1279"
    counts = [int(c) for c in sys.argv[2:]] or [8, 12, 16, 20, 24]
    res = et.setup(config)
    emit("config", f"{config} T{res.nsmax} ndgl {res.ndgl} nfld {NFLD_SYN}")

    def devgen(*shape):
        n = int(np.prod(shape))
        return jax.jit(lambda: jnp.sin(
            jax.lax.iota(jnp.float32, n) * 0.7).reshape(shape))()

    four = devgen(NFLD_SYN, 2, res.M, res.ndgl)

    @jax.jit
    def fft_pair(four, bt):
        grid = fourier.synthesis_bucketed(four, bt, prec="highest")
        return fourier.analysis_bucketed(grid, bt, four.shape[2],
                                         prec="highest")

    for nb in counts:
        os.environ["ECTRANS_TPU_FFT_BUCKETS"] = str(nb)
        bt = fourier.bucketed_tables_for(res, jnp.float32)
        nffts = [b.bt.nfft for b in bt.buckets]
        t = chain_time(lambda x: fft_pair(x, bt), four)
        emit(f"pair_ms_nb{nb}", {
            "ms": round(t * 1e3, 2), "buckets": len(bt.buckets),
            "nffts": nffts,
            "work_proxy_gmacs": round(sum(
                2 * (b.i1 - b.i0) * b.bt.nfft * (NFLD_SYN + 1) // 2 * 400
                for b in bt.buckets) / 1e9, 1)})
        # free this count's chirp tables before building the next set
        fourier.bucketed_tables.cache_clear()
        del bt


if __name__ == "__main__":
    main()
