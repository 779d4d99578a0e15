"""Tracing and phase timing: the DR_HOOK / GSTATS analogue (SURVEY.md §5).

The reference wraps every routine in DR_HOOK('NAME', 0/1) markers and every
transform phase in numbered GSTATS counters (``ltinv_ctl_mod.F90:84,113``;
NVTX ranges on GPU, ``tpm_stats.F90``).  Here:

* ``hook("NAME")`` — context manager combining ``jax.named_scope`` (the
  name shows up in XLA HLO metadata and xprof/jax.profiler traces — the
  NVTX equivalent) with wall-clock accounting when entered outside jit.
* ``gstats("name")`` — pure wall-clock phase counters with a GSTATS-style
  report (count / total / avg / min / max).

Device work is asynchronous, so wall-clock numbers for code that merely
*enqueues* work measure dispatch unless you block; pass ``block=True`` to
time the device work itself (inserts block_until_ready on the result of
the wrapped callable via ``timed``).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

_lock = threading.Lock()
_stats: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def gstats(name: str):
    """Wall-clock phase counter (GSTATS equivalent)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _stats[name].append(dt)


@contextlib.contextmanager
def hook(name: str):
    """named_scope + wall-clock region marker (DR_HOOK equivalent).

    Inside a jit trace the named_scope annotates the HLO (visible in
    profiler timelines); outside it also accumulates wall-clock stats.
    """
    import jax

    with jax.named_scope(name):
        with gstats(name):
            yield


def timed(name: str, fn, *args, block: bool = True, **kw):
    """Run fn under gstats(name), optionally blocking on its outputs so the
    measurement covers device execution."""
    import jax

    with gstats(name):
        out = fn(*args, **kw)
        if block:
            jax.block_until_ready(out)
    return out


def reset_gstats() -> None:
    with _lock:
        _stats.clear()


def gstats_report(out=None) -> str:
    """GSTATS-style report: name, count, total, avg, min, max (seconds)."""
    lines = [f"{'region':32s} {'count':>6s} {'total':>10s} {'avg':>10s} "
             f"{'min':>10s} {'max':>10s}"]
    with _lock:
        for name in sorted(_stats):
            ts = _stats[name]
            lines.append(
                f"{name:32s} {len(ts):6d} {sum(ts):10.4f} "
                f"{sum(ts)/len(ts):10.4f} {min(ts):10.4f} {max(ts):10.4f}"
            )
    rep = "\n".join(lines)
    if out is not None:
        print(rep, file=out)
    return rep
