"""Attribute and row-access tests (reference: tests/test_attributes.py)."""

import numpy as np
from hypothesis import given
import hypothesis.strategies as st

from csr_tpu.test_utils import csrs
from util import to_dense


@given(csrs())
def test_basic_attrs(csr):
    assert csr.nrows >= 0
    assert csr.ncols >= 0
    assert csr.nnz == len(csr.colinds)
    assert len(csr.rowptrs) == csr.nrows + 1


@given(csrs())
def test_row_nnzs(csr):
    nnzs = np.asarray(csr.row_nnzs())
    dense = to_dense(csr)
    counts = np.sum(dense != 0, axis=1)
    # stored entries can include duplicates/zeros only via from_coo filtering;
    # with unique coords the stored count matches the dense count
    assert np.all(nnzs == counts)
    assert nnzs.sum() == csr.nnz


@given(st.data())
def test_row_extent_cs_vs(data):
    csr = data.draw(csrs(nrows=st.integers(1, 30)))
    row = data.draw(st.integers(0, csr.nrows - 1))
    sp, ep = csr.row_extent(row)
    assert ep >= sp
    cs = np.asarray(csr.row_cs(row))
    vs = np.asarray(csr.row_vs(row))
    assert len(cs) == ep - sp
    assert len(vs) == ep - sp
    if csr.values is None:
        assert np.all(vs == 1.0)
    else:
        assert np.allclose(vs, np.asarray(csr.values)[sp:ep])


@given(st.data())
def test_row_dense(data):
    csr = data.draw(csrs(nrows=st.integers(1, 30)))
    row = data.draw(st.integers(0, csr.nrows - 1))
    dense = to_dense(csr)
    r = np.asarray(csr.row(row))
    assert r.shape == (csr.ncols,)
    np.testing.assert_allclose(r, dense[row], rtol=1e-6)


@given(st.data())
def test_row_multi(data):
    csr = data.draw(csrs(nrows=st.integers(1, 30)))
    k = data.draw(st.integers(1, 5))
    rows = np.asarray(
        data.draw(st.lists(st.integers(0, csr.nrows - 1), min_size=k, max_size=k)),
        np.int32,
    )
    dense = to_dense(csr)
    r = np.asarray(csr.row(rows))
    assert r.shape == (k, csr.ncols)
    np.testing.assert_allclose(r, dense[rows], rtol=1e-6)


@given(st.data())
def test_row_mask(data):
    csr = data.draw(csrs(nrows=st.integers(1, 30)))
    row = data.draw(st.integers(0, csr.nrows - 1))
    dense = to_dense(csr)
    m = np.asarray(csr.row_mask(row))
    assert m.dtype == bool
    assert np.all(m == (dense[row] != 0))


@given(csrs())
def test_rowinds(csr):
    ris = np.asarray(csr.rowinds())
    assert len(ris) == csr.nnz
    rps = np.asarray(csr.rowptrs)
    for i in range(csr.nrows):
        assert np.all(ris[rps[i] : rps[i + 1]] == i)


@given(csrs(values=True))
def test_values_setter_truncates(csr):
    vs = np.arange(csr.nnz + 3, dtype=np.float64)
    csr.values = vs
    assert len(csr.values) == csr.nnz


@given(csrs(values=True))
def test_values_setter_too_small(csr):
    if csr.nnz == 0:
        return
    try:
        csr.values = np.zeros(csr.nnz - 1)
        assert False, "expected ValueError"
    except ValueError:
        pass


@given(csrs())
def test_copy(csr):
    c2 = csr.copy()
    np.testing.assert_allclose(to_dense(c2), to_dense(csr))
    c3 = csr.copy(include_values=False)
    assert c3.values is None


@given(csrs())
def test_str_repr(csr):
    assert str(csr).startswith("<CSR ")
    assert repr(csr).startswith("<CSR ")
