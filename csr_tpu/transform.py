"""
Value transformations (reference: csr/transform.py).

Row centering and unit normalization, implemented with segment reductions
instead of per-row loops.  These return ``(new_values, stats)``; the
in-place rebinding happens in :meth:`csr_tpu.CSR.normalize_rows`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import structure


@functools.partial(jax.jit, static_argnames=("nrows",))
def _center_rows_jit(rowptrs, values, nrows: int):
    nnz = values.shape[0]
    rids = structure._row_ids(rowptrs, nrows, nnz)
    sums = jax.ops.segment_sum(values, rids, num_segments=nrows, indices_are_sorted=True)
    counts = (rowptrs[1:] - rowptrs[:-1]).astype(values.dtype)
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), 0)
    return values - means[rids], means


def center_rows(csr):
    """Mean-center the stored values of each row
    (reference: csr/transform.py:14-26).

    Returns:
        (values, means): the centered value array and per-row means
        (0 for empty rows).
    """
    vs, means = _center_rows_jit(csr.rowptrs, csr.values, csr.nrows)
    return vs, means


@functools.partial(jax.jit, static_argnames=("nrows",))
def _unit_rows_jit(rowptrs, values, nrows: int):
    nnz = values.shape[0]
    dtype = values.dtype
    info = jnp.finfo(dtype)
    rids = structure._row_ids(rowptrs, nrows, nnz)

    # IEEE-754-safe unit normalization: if row values are all tiny, naive
    # sum-of-squares underflows (subnormals), producing a norm that is too
    # small and a "unit" row with norm > 1.  Pre-scale each row by a power
    # of two derived from its max |value| before computing the norm
    # (reference: csr/transform.py:40-63, courtesy @jekstrand).
    absmax = jax.ops.segment_max(
        jnp.abs(values), rids, num_segments=nrows, indices_are_sorted=True
    )
    absmax = jnp.where(jnp.isfinite(absmax), absmax, 0)  # empty rows -> -inf

    _, ve = jnp.frexp(absmax)
    pnexp = jnp.clip(-ve, info.minexp, info.maxexp - 1)
    prenorm = jnp.ldexp(jnp.ones((), dtype), pnexp)

    scaled = values * prenorm[rids]
    sq = jax.ops.segment_sum(
        scaled * scaled, rids, num_segments=nrows, indices_are_sorted=True
    )
    inorm = jnp.sqrt(sq)

    counts = rowptrs[1:] - rowptrs[:-1]
    nonempty = counts > 0
    norms = jnp.where(nonempty, inorm / prenorm, 0)
    new_vals = jnp.where(nonempty[rids], scaled / jnp.maximum(inorm[rids], info.tiny), values)
    return new_vals, norms


def unit_rows(csr):
    """Normalize each row to a unit vector
    (reference: csr/transform.py:30-66).

    Returns:
        (values, norms): the normalized value array and per-row Euclidean
        norms (0 for empty rows).
    """
    vs, norms = _unit_rows_jit(csr.rowptrs, csr.values, csr.nrows)
    return vs, norms
