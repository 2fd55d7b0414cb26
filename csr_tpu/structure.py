"""
Structure manipulation for TPU CSR matrices.

This module plays the role of the reference's ``csr/structure.py``, but the
algorithms are XLA-first: instead of sequential counting-sort loops
(reference: csr/structure.py:12-58) we use stable sorts, ``bincount`` and
``segment_sum``, which XLA compiles to efficient fused TPU programs.

All functions here are *functional*: they return new arrays.  In-place
semantics of the public API (``CSR.sort_rows`` etc.) are provided at the
class level by rebinding fields.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .dtypes import COLIND_DTYPE, big_int, ptr_dtype


# ---------------------------------------------------------------------------
# helpers


@functools.partial(jax.jit, static_argnames=("nrows", "out_dtype"))
def _rowptrs_from_rows(rows, nrows: int, out_dtype):
    """Build row pointers from (unsorted) COO row indices via bincount+cumsum."""
    counts = jnp.bincount(rows, length=nrows).astype(out_dtype)
    rps = jnp.zeros(nrows + 1, dtype=out_dtype)
    return rps.at[1:].set(jnp.cumsum(counts))


@functools.partial(jax.jit, static_argnames=("nrows", "nnz"))
def _row_ids(rowptrs, nrows: int, nnz: int):
    """Expand row pointers to a per-entry row-index vector.

    The searchsorted form compiles to a single vectorized XLA op, replacing
    the reference's sequential fill loop (csr/_rows.py:122-128).
    """
    if nnz == 0:
        return jnp.zeros(0, dtype=jnp.int32)
    from .dtypes import x64_scope

    # entry positions past INT32_MAX require true int64 (x64_scope keeps
    # the arange from silently narrowing when jax_enable_x64 is off)
    with x64_scope(nnz > np.iinfo(np.int32).max):
        pos = jnp.arange(nnz, dtype=rowptrs.dtype)
        return (
            jnp.searchsorted(rowptrs[1 : nrows + 1], pos, side="right")
            .astype(jnp.int32)
        )


def row_ids_for(csr) -> jnp.ndarray:
    """Row index of each stored entry of ``csr`` (COO row vector)."""
    return _row_ids(csr.rowptrs, csr.nrows, csr.nnz)


# ---------------------------------------------------------------------------
# COO -> CSR


@functools.partial(jax.jit, static_argnames=("nrows",))
def _from_coo_jit(rows, cols, nrows: int):
    rows = rows.astype(jnp.int32)
    # Stable sort keeps the input order of entries within a row, matching the
    # reference's two-pass counting scatter (csr/structure.py:12-58).
    perm = jnp.argsort(rows, stable=True)
    out_cols = cols.astype(COLIND_DTYPE)[perm]
    rps = _rowptrs_from_rows(rows, nrows, big_int())
    return rps, out_cols, perm


def from_coo(nrows: int, rows, cols, values=None):
    """COO triple -> (rowptrs, colinds, values).

    Reference: csr/structure.py:61-67.  Host (numpy) inputs take the native
    C++ counting-sort path (:mod:`csr_tpu.native`); device arrays convert
    on-device via a stable sort.  Returns wide rowptrs; the caller
    (``CSR.__init__``) narrows them per the dtype policy.
    """
    if not isinstance(rows, jax.Array) and not isinstance(cols, jax.Array):
        from . import native

        host = native.from_coo(nrows, rows, cols, values)
        if host is not None:
            return host

    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    rps, out_cols, perm = _from_coo_jit(rows, cols, nrows)
    if values is None:
        return rps, out_cols, None
    values = jnp.asarray(values)
    return rps, out_cols, values[perm]


# ---------------------------------------------------------------------------
# transpose


@functools.partial(jax.jit, static_argnames=("nrows", "ncols"))
def _transpose_jit(rowptrs, colinds, nrows: int, ncols: int):
    nnz = colinds.shape[0]
    rids = _row_ids(rowptrs, nrows, nnz)
    # Stable sort by column index: preserves row order within each column,
    # exactly like the reference's count-then-scatter passes
    # (csr/structure.py:172-237).
    perm = jnp.argsort(colinds.astype(jnp.int32), stable=True)
    t_colinds = rids[perm].astype(COLIND_DTYPE)
    t_rowptrs = _rowptrs_from_rows(colinds, ncols, rowptrs.dtype)
    return t_rowptrs, t_colinds, perm


def transpose_arrays(rowptrs, colinds, values, nrows: int, ncols: int):
    """Transpose CSR arrays; returns (rowptrs, colinds, values) of the
    transpose (a ``ncols x nrows`` matrix)."""
    t_rps, t_cis, perm = _transpose_jit(rowptrs, colinds, nrows, ncols)
    t_vs = None if values is None else values[perm]
    return t_rps, t_cis, t_vs


# ---------------------------------------------------------------------------
# row sorting


@functools.partial(jax.jit, static_argnames=("nrows",))
def _sort_rows_jit(rowptrs, colinds, nrows: int):
    nnz = colinds.shape[0]
    rids = _row_ids(rowptrs, nrows, nnz)
    # Lexicographic (row, col) via two stable device sorts (least-significant
    # key first), replacing the per-row bubble sort (csr/structure.py:156-169).
    perm = jnp.argsort(colinds.astype(jnp.int32), stable=True)
    perm = perm[jnp.argsort(rids[perm], stable=True)]
    return colinds[perm], perm


def sort_rows_arrays(rowptrs, colinds, values, nrows: int):
    """Sort each row by increasing column index. Returns (colinds, values)."""
    cis, perm = _sort_rows_jit(rowptrs, colinds, nrows)
    vs = None if values is None else values[perm]
    return cis, vs


# ---------------------------------------------------------------------------
# row subsetting / picking


def subset_rows_arrays(csr, begin: int, end: int):
    """Subset rows [begin, end); shares device buffers via XLA slices.

    Reference: csr/structure.py:70-81.  The nnz of the result is data
    dependent, so this op syncs two rowptr scalars to the host.
    """
    sp = int(csr.rowptrs[begin])
    ep = int(csr.rowptrs[end])
    rps = csr.rowptrs[begin : end + 1] - sp
    cis = csr.colinds[sp:ep]
    vs = None if csr.values is None else csr.values[sp:ep]
    return rps, cis, vs, ep - sp


@functools.partial(jax.jit, static_argnames=("out_nnz",))
def _pick_rows_jit(rowptrs, rows, out_rps, out_nnz: int):
    nr = rows.shape[0]
    # output position -> which picked row it belongs to
    out_rid = jnp.searchsorted(
        out_rps[1 : nr + 1], jnp.arange(out_nnz, dtype=out_rps.dtype), side="right"
    )
    # source index = row start of the source row + offset within the row
    src_row = rows[out_rid]
    offset = jnp.arange(out_nnz, dtype=out_rps.dtype) - out_rps[out_rid]
    src_idx = rowptrs[src_row].astype(out_rps.dtype) + offset
    return src_idx


def pick_rows_arrays(csr, rows, include_values: bool = True):
    """Gather a (possibly repeating) selection of rows.

    Reference: csr/structure.py:85-153 (sequential copy loops) — here a
    single vectorized gather.
    """
    rows = jnp.asarray(rows, dtype=jnp.int32)
    nr = int(rows.shape[0])
    sizes = csr.rowptrs[rows + 1] - csr.rowptrs[rows]
    out_rps = jnp.zeros(nr + 1, dtype=big_int())
    out_rps = out_rps.at[1:].set(jnp.cumsum(sizes.astype(big_int())))
    out_nnz = int(out_rps[-1])
    src_idx = _pick_rows_jit(csr.rowptrs, rows, out_rps, out_nnz)
    cis = csr.colinds[src_idx]
    vs = None
    if include_values and csr.values is not None:
        vs = csr.values[src_idx]
    return out_rps.astype(ptr_dtype(out_nnz)), cis, vs, out_nnz


# ---------------------------------------------------------------------------
# nnz filtering / compaction


def filter_nnzs_arrays(csr, filt):
    """Keep only the entries where ``filt`` is True.

    Reference: csr/csr.py:494-522.  The output nnz is data dependent; we sync
    it once, then compact with a static-size ``nonzero`` gather.
    """
    filt = jnp.asarray(filt, dtype=bool)
    nnz2 = int(jnp.sum(filt))
    keep = jnp.nonzero(filt, size=nnz2)[0]
    rids = row_ids_for(csr)
    counts = jax.ops.segment_sum(
        filt.astype(big_int()), rids, num_segments=csr.nrows,
        indices_are_sorted=True,
    )
    rps2 = jnp.zeros(csr.nrows + 1, dtype=big_int())
    rps2 = rps2.at[1:].set(jnp.cumsum(counts))
    cis2 = csr.colinds[keep]
    vs2 = None if csr.values is None else csr.values[keep]
    return rps2.astype(ptr_dtype(nnz2)), cis2, vs2, nnz2


def assemble_shards_arrays(shards):
    """Concatenate row shards back into one matrix.

    Reference: csr/csr.py:623-650.
    """
    nrows = sum(s.nrows for s in shards)
    ncols = max(s.ncols for s in shards)
    nnz = sum(s.nnz for s in shards)
    dt = ptr_dtype(nnz)
    rp_parts = [jnp.zeros(1, dtype=dt)]
    off = 0
    for s in shards:
        rp_parts.append(s.rowptrs[1:].astype(dt) + off)
        off += s.nnz
    rps = jnp.concatenate(rp_parts)
    cis = jnp.concatenate([s.colinds for s in shards]) if nnz else jnp.zeros(0, COLIND_DTYPE)
    if shards[0].values is not None:
        vs = jnp.concatenate([s._required_values() for s in shards])
    else:
        vs = None
    return nrows, ncols, nnz, rps, cis, vs
