"""Transpose tests (reference: tests/test_transpose.py)."""

import numpy as np
from hypothesis import given

from csr_tpu.test_utils import csrs
from util import to_dense


@given(csrs())
def test_transpose(csr):
    t = csr.transpose()
    assert t.nrows == csr.ncols
    assert t.ncols == csr.nrows
    assert t.nnz == csr.nnz
    np.testing.assert_allclose(to_dense(t), to_dense(csr).T, rtol=1e-6)


@given(csrs())
def test_transpose_structure(csr):
    t = csr.transpose_structure()
    assert t.values is None
    np.testing.assert_allclose(to_dense(t) != 0, to_dense(csr).T != 0)


@given(csrs())
def test_double_transpose(csr):
    t2 = csr.transpose().transpose()
    np.testing.assert_allclose(to_dense(t2), to_dense(csr), rtol=1e-6)


@given(csrs())
def test_transpose_rows_sorted_by_row(csr):
    """The transpose's rows come out sorted by column (stable sort by the
    original column preserves row order within a column)."""
    t = csr.transpose()
    rps = np.asarray(t.rowptrs)
    cis = np.asarray(t.colinds)
    for i in range(t.nrows):
        row = cis[rps[i] : rps[i + 1]]
        assert np.all(np.diff(row) >= 0)
