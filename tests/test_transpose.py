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


@given(csrs(values=True))
def test_transpose_without_values(csr):
    """``transpose(include_values=False)`` drops values: structure-only
    result densifies to 1s (reference: tests/test_transpose.py
    test_csr_transpose_coords)."""
    t = csr.transpose(include_values=False)
    assert t.values is None
    np.testing.assert_array_equal(to_dense(t) != 0, to_dense(csr).T != 0)


def test_transpose_small_exact():
    """Fixed small case with exact rowptr expectations (reference:
    tests/test_transpose.py test_csr_transpose)."""
    from csr_tpu import CSR

    rows = np.array([0, 0, 1, 3], dtype=np.int32)
    cols = np.array([1, 2, 0, 1], dtype=np.int32)
    vals = np.arange(4, dtype=np.float32)
    csr = CSR.from_coo(rows, cols, vals)
    csc = csr.transpose()
    assert csc.nrows == csr.ncols
    assert csc.ncols == csr.nrows
    np.testing.assert_array_equal(np.asarray(csc.rowptrs), [0, 1, 3, 4])
    assert float(np.asarray(csc.values).sum()) == float(vals.sum())
    for r, c, v in zip(rows, cols, vals):
        assert float(np.asarray(csc.row(c))[r]) == v


def test_transpose_empty_column():
    """Transpose with empty output rows (a zeroed column) keeps exact
    scipy rowptr agreement (reference: test_csr_transpose_erow)."""
    import scipy.sparse as sps
    from csr_tpu import CSR

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((40, 25))
    mat[mat <= 0] = 0
    mat[:, 0:2] = 0
    smat = sps.csr_matrix(mat)
    csr = CSR.from_scipy(smat)
    t = csr.transpose()
    st = smat.T.tocsr()
    np.testing.assert_array_equal(np.asarray(t.rowptrs), st.indptr)
    np.testing.assert_allclose(to_dense(t), st.toarray(), rtol=1e-6)


def test_transpose_duplicate_coordinates():
    """Duplicate (row, col) coordinates survive transpose with dense
    semantics intact.  Their relative value order is unspecified (the
    2-key device sort is unstable on duplicates), so only the dense form
    and the per-coordinate multiset are asserted."""
    from csr_tpu import CSR

    rows = np.array([1, 1, 0, 1, 1], np.int32)
    cols = np.array([2, 2, 0, 2, 1], np.int32)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    c = CSR.from_coo(rows, cols, vals, (3, 3))
    t = c.transpose()
    assert t.nnz == 5
    dense = np.zeros((3, 3), np.float32)
    np.add.at(dense, (cols, rows), vals)
    np.testing.assert_allclose(to_dense(t), dense, rtol=1e-6)
    # the three duplicates all land in transpose row 2, column 1
    rps = np.asarray(t.rowptrs)
    assert sorted(np.asarray(t.values)[rps[2]:rps[3]][
        np.asarray(t.colinds)[rps[2]:rps[3]] == 1].tolist()) == [1.0, 2.0, 4.0]
