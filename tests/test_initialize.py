"""Construction tests (reference: tests/test_initialize.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
import hypothesis.strategies as st

from csr_tpu import CSR, create_empty, create_from_sizes
from csr_tpu.test_utils import csrs, has_memory


def test_create_empty_basic():
    m = create_empty(5, 7)
    assert m.nrows == 5
    assert m.ncols == 7
    assert m.nnz == 0
    assert np.all(np.asarray(m.rowptrs) == 0)


@given(st.integers(0, 100), st.integers(0, 100))
def test_empty(nrows, ncols):
    m = CSR.empty(nrows, ncols)
    assert m.nrows == nrows
    assert m.ncols == ncols
    assert m.nnz == 0
    assert len(m.rowptrs) == nrows + 1


@given(st.data())
def test_empty_with_sizes(data):
    nrows = data.draw(st.integers(1, 50))
    ncols = data.draw(st.integers(1, 50))
    sizes = data.draw(
        st.lists(st.integers(0, ncols), min_size=nrows, max_size=nrows)
    )
    m = CSR.empty(nrows, ncols, row_nnzs=sizes)
    assert m.nrows == nrows
    assert m.nnz == sum(sizes)
    assert np.all(np.diff(np.asarray(m.rowptrs)) == np.asarray(sizes))
    assert m.values is not None
    assert np.all(np.asarray(m.values) == 0)


def test_from_coo_rpdtype():
    """from_coo honors an explicit rowptr dtype (the reference accepts
    rpdtype but never reads it, reference: csr/csr.py:140)."""
    rows = [0, 1, 1, 3]
    cols = [2, 0, 3, 1]
    vals = [1.0, 2.0, 3.0, 4.0]
    c64 = CSR.from_coo(rows, cols, vals, (4, 4), rpdtype=np.int64)
    # honored even without jax_enable_x64 (x64 scope guards the cast)
    assert c64.rowptrs.dtype == np.int64
    c16 = CSR.from_coo(rows, cols, vals, (4, 4), rpdtype=np.int16)
    assert c16.rowptrs.dtype == np.int16
    # capacity check: int8 cannot address >127 entries
    big_rows = np.zeros(200, np.int32)
    big_cols = np.arange(200, dtype=np.int32) % 4
    with pytest.raises(ValueError):
        CSR.from_coo(big_rows, big_cols, None, (1, 4), rpdtype=np.int8)


def test_empty_novalues():
    m = CSR.empty(4, 4, row_nnzs=[1, 0, 2, 1], values=False)
    assert m.values is None
    assert m.nnz == 4


def test_empty_custom_dtype():
    m = CSR.empty(4, 4, row_nnzs=[1, 0, 2, 1], values="f4")
    assert m.values.dtype == np.float32


@given(st.data())
def test_create_from_sizes(data):
    nrows = data.draw(st.integers(1, 30))
    ncols = data.draw(st.integers(1, 30))
    sizes = np.asarray(
        data.draw(st.lists(st.integers(0, ncols), min_size=nrows, max_size=nrows)),
        np.int32,
    )
    m = create_from_sizes(nrows, ncols, sizes)
    assert m.nrows == nrows
    assert m.nnz == int(sizes.sum())
    assert np.all(np.asarray(m.colinds) == -1)


@given(csrs())
def test_csr_from_coo_roundtrip(csr):
    """COO data -> CSR has consistent structure."""
    assert csr.nnz == int(csr.rowptrs[-1])
    assert len(csr.colinds) == csr.nnz
    if csr.values is not None:
        assert len(csr.values) == csr.nnz
    # row pointers are monotone
    rps = np.asarray(csr.rowptrs)
    assert np.all(np.diff(rps) >= 0)
    cis = np.asarray(csr.colinds)
    if csr.nnz:
        assert cis.min() >= 0
        assert cis.max() < csr.ncols


def test_from_coo_shape_inference():
    m = CSR.from_coo(np.array([0, 2]), np.array([1, 3]), np.array([1.0, 2.0]))
    assert m.nrows == 3
    assert m.ncols == 4


def test_from_coo_novalue():
    m = CSR.from_coo(np.array([0, 1]), np.array([1, 0]), None, (2, 2))
    assert m.values is None
    d = m.to_scipy().toarray()
    assert np.all(d == np.array([[0, 1], [1, 0]]))


def test_from_coo_preserves_in_row_order():
    """Entries keep their input order within a row (stable conversion,
    reference: csr/structure.py:36-58)."""
    rows = np.array([0, 0, 0])
    cols = np.array([5, 2, 7])
    vals = np.array([1.0, 2.0, 3.0])
    m = CSR.from_coo(rows, cols, vals, (1, 10))
    assert np.all(np.asarray(m.colinds) == [5, 2, 7])
    assert np.all(np.asarray(m.values) == [1.0, 2.0, 3.0])


# -- large-scale gated tests (reference: tests/test_initialize.py:56-98,
# tests/test_mkl.py:94-125) -------------------------------------------------

_BIG_ROWS = 4_200_000
_BIG_NPR = 512  # 2.1504e9 nnz > INT32_MAX -> int64 rowptrs


@pytest.mark.skipif(
    not has_memory(48), reason="needs >=48 GB RAM"
)
def test_large_nnz_int64_rowptrs():
    """Construction past INT32_MAX entries promotes rowptrs to int64
    (reference: tests/test_initialize.py:56-98)."""
    import jax.numpy as jnp

    csr = CSR.empty(_BIG_ROWS, 500, np.full(_BIG_ROWS, _BIG_NPR))
    assert csr.nnz == _BIG_ROWS * _BIG_NPR
    assert csr.nnz > np.iinfo(np.int32).max
    assert csr.rowptrs.dtype == jnp.int64
    assert int(csr.rowptrs[-1]) == csr.nnz


@pytest.mark.skipif(
    not has_memory(48), reason="needs >=48 GB RAM"
)
def test_large_nnz_spmv_smoke():
    """SpMV at >INT32_MAX stored entries completes without NaNs
    (reference: tests/test_mkl.py:94-125 at 2.5B nnz)."""
    rng = np.random.default_rng(0)
    nnz = _BIG_ROWS * _BIG_NPR
    rowptrs = np.arange(_BIG_ROWS + 1, dtype=np.int64) * _BIG_NPR
    colinds = rng.integers(0, 500, nnz, dtype=np.int32)
    csr = CSR(_BIG_ROWS, 500, nnz, rowptrs, colinds, None)
    x = np.ones(500, np.float32)
    from csr_tpu.kernels import use_kernel

    with use_kernel("xla"):
        y = np.asarray(csr.mult_vec(x))
    assert y.shape == (_BIG_ROWS,)
    assert np.all(np.isfinite(y))
    # structure-only implicit ones: every row sums to its entry count
    assert np.all(y == _BIG_NPR)
