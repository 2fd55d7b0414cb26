"""
Debug guards: catching silent host↔device transfers.

The reference's "sanitizer" story is thread-safety by construction plus
MKL's hard aborts (SURVEY §5); the TPU-era hazard class is different:
*silent device↔host transfers* (a host numpy touch of an HBM array stalls
the pipeline and, on remote runtimes, round-trips the tunnel).  This
module wraps JAX's transfer guard as a context manager scoped to sparse
workloads.

Determinism note: all reductions in the xla kernel use
``segment_sum(..., indices_are_sorted=True)`` over row-major-sorted
entries, and the Pallas kernels accumulate in a fixed micro-row order, so
results are bitwise-reproducible run to run on the same device — the
analog of the reference's fixed flat-loop accumulation order
(reference: csr/kernels/numba/__init__.py:55-67).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def guard_transfers(level: str = "disallow"):
    """Fail (or log) on implicit device↔host transfers inside the block.

    Levels: ``"allow"``, ``"log"``, ``"disallow"`` (see
    ``jax.transfer_guard``).  Explicit transfers (``jax.device_put``,
    ``np.asarray(x)`` on a committed array) are still permitted by JAX's
    guard semantics only when explicit — accidental implicit conversions
    raise.

    Example::

        with guard_transfers():
            y = a.mult_vec(x)      # any hidden host round-trip raises
    """
    with jax.transfer_guard(level):
        yield
