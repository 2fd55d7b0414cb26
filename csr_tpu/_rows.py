"""
Row access operations (reference: csr/_rows.py).

Densification and per-row slicing.  Multi-row densification is a single
vectorized scatter instead of the reference's per-row fill loop
(csr/_rows.py:41-49).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import structure


def extent(csr, row):
    """(start, end) positions of ``row`` in the data arrays
    (reference: csr/_rows.py:9-13)."""
    sp = int(csr.rowptrs[row])
    ep = int(csr.rowptrs[row + 1])
    return sp, ep


@functools.partial(jax.jit, static_argnames=("nrows", "ncols", "dtype"))
def _densify(rowptrs, colinds, values, rows, nrows: int, ncols: int, dtype):
    """Densify the selected rows into a (k, ncols) array via one scatter."""
    nnz = colinds.shape[0]
    rids = structure._row_ids(rowptrs, nrows, nnz)
    if nnz == 0:
        return jnp.zeros((rows.shape[0], ncols), dtype=dtype)
    if values is None:
        vals = jnp.ones(nnz, dtype=dtype)
    else:
        vals = values.astype(dtype)

    # out[i, :] = dense form of row rows[i]; duplicate stored positions
    # overwrite (reference fills by assignment, csr/_rows.py:14-27)
    def fill_one(r):
        sel = rids == r
        return jnp.zeros(ncols, dtype=dtype).at[
            jnp.where(sel, colinds, ncols)
        ].set(vals, mode="drop")

    return jax.vmap(fill_one)(rows)


def row_array(csr, row):
    """Dense row(s) (reference: csr/_rows.py:52-91).

    Structure-only rows densify to 1s; single-row structure-only results are
    float32 to mirror the reference's f4 (csr/_rows.py:57)."""
    row = jnp.asarray(row, dtype="i4")
    if csr.values is not None:
        dtype = csr.values.dtype
    else:
        dtype = jnp.float32
    single = row.shape == ()
    rows = row[None] if single else row
    out = _densify(csr.rowptrs, csr.colinds, csr.values, rows, csr.nrows, csr.ncols, dtype)
    return out[0] if single else out


def row_mask(csr, row):
    """Dense boolean mask(s) of stored columns (reference: csr/_rows.py:90-96)."""
    row = jnp.asarray(row, dtype="i4")
    single = row.shape == ()
    rows = row[None] if single else row
    out = _densify(csr.rowptrs, csr.colinds, None, rows, csr.nrows, csr.ncols, jnp.float32)
    out = out != 0
    return out[0] if single else out


def cs(csr, row):
    """Column indices of a row (reference: csr/_rows.py:98-101)."""
    sp, ep = extent(csr, row)
    return csr.colinds[sp:ep]


def vs(csr, row):
    """Stored values of a row; implicit 1s when structure-only
    (reference: csr/_rows.py:104-119)."""
    sp, ep = extent(csr, row)
    if csr.values is not None:
        return csr.values[sp:ep]
    return jnp.full(ep - sp, 1.0)


def all_indices(csr):
    """COO row vector (reference: csr/_rows.py:122-128)."""
    return structure.row_ids_for(csr)
