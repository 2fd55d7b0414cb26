"""Pickling tests (reference: tests/test_pickle.py)."""

import pickle

import numpy as np
from hypothesis import given

from csr_tpu.test_utils import csrs
from util import to_dense


@given(csrs())
def test_pickle_roundtrip(csr):
    c2 = pickle.loads(pickle.dumps(csr))
    assert c2.nrows == csr.nrows
    assert c2.ncols == csr.ncols
    assert c2.nnz == csr.nnz
    np.testing.assert_allclose(to_dense(c2), to_dense(csr), rtol=1e-6)
    if csr.values is None:
        assert c2.values is None


@given(csrs(values=True))
def test_pickle_preserves_dtype(csr):
    c2 = pickle.loads(pickle.dumps(csr))
    assert c2.values.dtype == csr.values.dtype
