"""
Constructors for CSRs (reference: csr/constructors.py).

The reference exposes these as Numba-callable creation functions; here they
are plain functions producing device CSRs, and all of them are usable
inside ``jax.jit``-traced code when given traced arrays (the CSR pytree
carries only static shape metadata).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .csr import CSR
from .dtypes import COLIND_DTYPE, default_value_dtype


def create_empty(nrows, ncols):
    """Create an empty CSR of the specified size
    (reference: csr/constructors.py:12-24)."""
    rowptrs = jnp.zeros(int(nrows) + 1, dtype=jnp.int32)
    colinds = jnp.zeros(0, dtype=COLIND_DTYPE)
    values = jnp.zeros(0, dtype=default_value_dtype())
    return CSR(nrows, ncols, 0, rowptrs, colinds, values)


def create_novalues(nrows, ncols, nnz, rowptrs, colinds):
    """Create a CSR without values (reference: csr/constructors.py:27-33)."""
    return CSR(nrows, ncols, nnz, rowptrs, colinds, None)


def create(nrows, ncols, nnz, rowptrs, colinds, values):
    """Create a CSR (reference: csr/constructors.py:36-42)."""
    return CSR(nrows, ncols, nnz, rowptrs, colinds, values)


def create_from_sizes(nrows, ncols, sizes):
    """Create a CSR with specified row sizes; column indices are -1 and
    values NaN until filled (reference: csr/constructors.py:45-68)."""
    sizes = np.asarray(sizes)
    nnz = int(np.sum(sizes))
    assert nnz >= 0
    rowptrs = np.zeros(int(nrows) + 1, dtype=np.int64)
    np.cumsum(sizes, dtype=np.int64, out=rowptrs[1:])
    colinds = jnp.full(nnz, -1, dtype=COLIND_DTYPE)
    values = jnp.full(nnz, np.nan, dtype=default_value_dtype())
    return CSR(nrows, ncols, nnz, rowptrs, colinds, values)
