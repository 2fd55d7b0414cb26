"""
Profiling utilities: roofline accounting and op timing.

The reference's observability is handle-leak tracing and pytest-benchmark
timings (SURVEY §5).  On TPU the currencies that matter are achieved HBM
bandwidth and stored-entries-per-second versus the chip's speed-of-light,
so this module provides:

* :func:`device_peak_gbps` — peak HBM bandwidth for the local chip;
* :class:`Roofline` — bytes/role accounting for an op, yielding achieved
  GB/s, nnz/s, and fraction-of-roofline;
* :func:`timed` — wall-clock timing with a chained-iteration option (the
  only reliable method through remote-tunnel TPU runtimes, where
  per-call ``block_until_ready`` can return before device completion).

``jax.profiler`` traces remain the deep-dive tool; these helpers cover
the always-on counters.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax

_PEAK_GBPS = {
    "v6e": 1638.0,
    "v6": 1638.0,
    "v5p": 2765.0,
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v4": 1228.0,
    "v3": 900.0,
    "v2": 700.0,
}


def device_peak_gbps(device=None) -> float:
    """Peak HBM bandwidth of a device (public per-generation figures)."""
    if device is None:
        device = jax.devices()[0]
    kind = device.device_kind.lower()
    for key, bw in _PEAK_GBPS.items():
        if key in kind:
            return bw
    return 819.0


@dataclass
class Roofline:
    """Byte/entry accounting for one sparse op."""

    bytes_streamed: int = 0
    bytes_resident: int = 0
    nnz: int = 0
    seconds: float = 0.0
    peak_gbps: float = field(default_factory=device_peak_gbps)

    @property
    def total_bytes(self) -> int:
        return self.bytes_streamed + self.bytes_resident

    @property
    def achieved_gbps(self) -> float:
        return self.total_bytes / self.seconds / 1e9 if self.seconds else 0.0

    @property
    def nnz_per_s(self) -> float:
        return self.nnz / self.seconds if self.seconds else 0.0

    @property
    def fraction_of_roofline(self) -> float:
        return self.achieved_gbps / self.peak_gbps if self.peak_gbps else 0.0

    def report(self) -> dict:
        return {
            "gbps": round(self.achieved_gbps, 2),
            "gnnz_per_s": round(self.nnz_per_s / 1e9, 3),
            "roofline_frac": round(self.fraction_of_roofline, 4),
            "seconds": self.seconds,
        }


def profiler_trace(log_dir: str):
    """Context manager wrapping ``jax.profiler.trace`` — captures a device
    trace viewable in TensorBoard/Perfetto (the deep-dive complement to
    the always-on Roofline counters; SURVEY §5 tracing equivalent)."""
    return jax.profiler.trace(log_dir)


def timed(fn, *args, iters: int = 10):
    """Median wall-clock seconds per call of ``fn(*args)`` with device sync."""
    fn(*args)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def timed_chained(step, x0, iters: int = 300, reps: int = 3):
    """Seconds per iteration of ``x -> step(x)`` chained inside one jitted
    loop with a host fetch at the end; best of ``reps`` runs.

    Chaining makes every iteration data-dependent, so neither XLA nor an
    asynchronous runtime can elide or overlap them; the host fetch bounds
    the measurement by real device completion.

    ``iters`` must be large: each chain *dispatch* costs ~22 ms through
    remote-tunnel runtimes regardless of length (docs/perf.md), so the
    per-iteration figure carries a +22ms/iters bias.
    """
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames="k")
    def chain(x, k):
        return jax.lax.fori_loop(0, k, lambda i, v: step(v), x)

    float(jnp.sum(chain(x0, iters)))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(chain(x0, iters)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
