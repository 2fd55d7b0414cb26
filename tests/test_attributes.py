"""Attribute and row-access tests (reference: tests/test_attributes.py)."""

import numpy as np
import pytest
from hypothesis import given
import hypothesis.strategies as st
import hypothesis.extra.numpy as nph

from csr_tpu import CSR
from csr_tpu.test_utils import csrs
from util import to_dense


def _fixture_csr():
    """The reference suite's 4x3 worked example
    (reference: tests/test_attributes.py:16-21)."""
    rows = np.array([0, 0, 1, 3], dtype=np.int32)
    cols = np.array([1, 2, 0, 1], dtype=np.int32)
    vals = np.arange(4, dtype=np.float32)
    return CSR.from_coo(rows, cols, vals, (4, 3))


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


# -- fixed worked examples (reference: tests/test_attributes.py:16-148) ------


def test_rowinds_fixed():
    csr = _fixture_csr()
    assert np.all(np.asarray(csr.rowinds()) == [0, 0, 1, 3])


def test_str_contains_shape():
    csr = _fixture_csr()
    assert "4x3" in str(csr)
    assert "4 nnz" in str(csr)


def test_row_extent_fixed():
    csr = _fixture_csr()
    assert csr.row_extent(0) == (0, 2)
    assert csr.row_extent(1) == (2, 3)
    assert csr.row_extent(2) == (3, 3)
    assert csr.row_extent(3) == (3, 4)


@given(csrs())
def test_row_extent_matches_rowptrs(csr):
    rps = np.asarray(csr.rowptrs)
    for i in range(csr.nrows):
        sp, ep = csr.row_extent(i)
        assert sp == rps[i]
        assert ep == rps[i + 1]


def test_row_fixed():
    csr = _fixture_csr()
    assert np.all(np.asarray(csr.row(0)) == [0.0, 0.0, 1.0])
    assert np.all(np.asarray(csr.row(1)) == [2.0, 0.0, 0.0])
    assert np.all(np.asarray(csr.row(2)) == [0.0, 0.0, 0.0])
    assert np.all(np.asarray(csr.row(3)) == [0.0, 3.0, 0.0])


def test_sparse_row_fixed():
    csr = _fixture_csr()
    assert np.all(np.asarray(csr.row_cs(0)) == [1, 2])
    assert np.all(np.asarray(csr.row_cs(1)) == [0])
    assert len(np.asarray(csr.row_cs(2))) == 0
    assert np.all(np.asarray(csr.row_cs(3)) == [1])
    assert np.all(np.asarray(csr.row_vs(0)) == [0.0, 1.0])
    assert np.all(np.asarray(csr.row_vs(1)) == [2.0])
    assert len(np.asarray(csr.row_vs(2))) == 0
    assert np.all(np.asarray(csr.row_vs(3)) == [3.0])


@given(st.data())
def test_row_mask_multi(data):
    """Mask over a list of rows: per-row stored columns all set, count
    matches the extent (reference: tests/test_attributes.py:111-131)."""
    csr = data.draw(csrs(nrows=st.integers(1, 30)))
    k = data.draw(st.integers(1, min(5, csr.nrows)))
    rows = data.draw(
        st.lists(st.integers(0, csr.nrows - 1), min_size=k, max_size=k,
                 unique=True)
    )
    m = np.asarray(csr.row_mask(np.asarray(rows, np.int32)))
    assert m.dtype == bool
    assert m.shape == (len(rows), csr.ncols)
    for i, r in enumerate(rows):
        sp, ep = csr.row_extent(r)
        cs = np.asarray(csr.row_cs(r))
        assert np.all(m[i, cs])
        assert np.sum(m[i]) == len(np.unique(cs))


# -- value setter semantics (reference: tests/test_attributes.py:169-225) ----


def test_set_values_fixed():
    csr = _fixture_csr()
    v2 = 10.0 - np.arange(4, dtype=np.float32)
    csr.values = v2
    assert np.all(np.asarray(csr.values) == v2)


def test_set_values_oversize_truncates():
    csr = _fixture_csr()
    v2 = np.arange(6, dtype=np.float32) + 10
    csr.values = v2
    assert csr.values is not None
    assert np.all(np.asarray(csr.values) == v2[:4])


def test_set_values_undersize_preserves():
    csr = _fixture_csr()
    with pytest.raises(ValueError):
        csr.values = np.arange(3, dtype=np.float32) + 5
    # the failed assignment must not clobber the existing values
    assert np.all(np.asarray(csr.values) == np.arange(4, dtype=np.float32))


def test_set_values_none_makes_structural():
    csr = _fixture_csr()
    csr.values = None
    assert csr.values is None
    # implicit ones semantics after the reset
    assert np.all(np.asarray(csr.row(0)) == [0.0, 1.0, 1.0])
    assert np.all(np.asarray(csr.row(1)) == [1.0, 0.0, 0.0])
    assert np.all(np.asarray(csr.row(3)) == [0.0, 1.0, 0.0])


@given(st.data())
def test_fill_values(data):
    """fill_values sets every stored entry, adding a value array to
    structure-only matrices (reference: tests/test_attributes.py:159-166)."""
    csr = data.draw(csrs())
    dtype = np.dtype("f4") if csr.values is None else np.dtype(
        csr.values.dtype
    )
    x = data.draw(
        nph.from_dtype(dtype, allow_infinity=False, allow_nan=False,
                       allow_subnormal=False)
    )
    csr.fill_values(x)
    assert csr.values is not None
    assert len(csr.values) == csr.nnz
    assert np.all(np.asarray(csr.values) == dtype.type(x))


@given(csrs(values=True))
def test_drop_values(csr):
    with pytest.deprecated_call():
        csr.drop_values()
    assert csr.values is None


# -- copy variants (reference: tests/test_attributes.py:241-311) -------------


@given(csrs())
def test_copy_full(csr):
    c2 = csr.copy()
    assert (c2.nrows, c2.ncols, c2.nnz) == (csr.nrows, csr.ncols, csr.nnz)
    assert c2.rowptrs is not csr.rowptrs
    assert np.all(np.asarray(c2.rowptrs) == np.asarray(csr.rowptrs))
    assert c2.colinds is not csr.colinds
    assert np.all(np.asarray(c2.colinds) == np.asarray(csr.colinds))
    if csr.values is not None:
        assert c2.values is not csr.values
        assert np.all(np.asarray(c2.values) == np.asarray(csr.values))
    else:
        assert c2.values is None


@given(csrs())
def test_copy_share_structure(csr):
    """copy(copy_structure=False) shares the index arrays (safe: JAX
    arrays are immutable)."""
    c2 = csr.copy(copy_structure=False)
    assert (c2.nrows, c2.ncols, c2.nnz) == (csr.nrows, csr.ncols, csr.nnz)
    assert c2.rowptrs is csr.rowptrs
    assert c2.colinds is csr.colinds
    if csr.values is not None:
        assert np.all(np.asarray(c2.values) == np.asarray(csr.values))
    else:
        assert c2.values is None


@given(csrs())
def test_copy_structure_only(csr):
    c2 = csr.copy(False)
    assert (c2.nrows, c2.ncols, c2.nnz) == (csr.nrows, csr.ncols, csr.nnz)
    assert np.all(np.asarray(c2.rowptrs) == np.asarray(csr.rowptrs))
    assert np.all(np.asarray(c2.colinds) == np.asarray(csr.colinds))
    assert c2.values is None


@given(csrs(values=False), st.booleans())
def test_copy_novalues(csr, inc):
    c2 = csr.copy(inc)
    assert (c2.nrows, c2.ncols, c2.nnz) == (csr.nrows, csr.ncols, csr.nnz)
    assert np.all(np.asarray(c2.colinds) == np.asarray(csr.colinds))
    assert c2.values is None
