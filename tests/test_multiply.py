"""SpGEMM tests over all kernels (reference: tests/test_multiply.py)."""

import numpy as np
from hypothesis import given, settings
import hypothesis.strategies as st

from csr_tpu.kernels import use_kernel
from csr_tpu.test_utils import csrs, mm_pairs
from util import to_dense


def _check_product(c, ref):
    d = to_dense(c)
    scale = max(1.0, np.abs(ref).max(initial=0))
    np.testing.assert_allclose(d, ref, rtol=5e-4, atol=1e-4 * scale)


@settings(max_examples=8)
@given(mm_pairs())
def test_mult_ab(kernel, pair):
    A, B = pair
    ref = to_dense(A) @ to_dense(B)
    with use_kernel(kernel):
        C = A.multiply(B)
    assert C.nrows == A.nrows
    assert C.ncols == B.ncols
    _check_product(C, ref)


@settings(max_examples=8)
@given(mm_pairs(max_shape=(50, 50, 50)))
def test_mult_abt(kernel, pair):
    A, Bt = pair
    B = Bt.transpose()
    ref = to_dense(A) @ to_dense(B).T
    with use_kernel(kernel):
        C = A.multiply(B, transpose=True)
    assert C.nrows == A.nrows
    assert C.ncols == B.nrows
    _check_product(C, ref)


@settings(max_examples=6)
@given(st.data())
def test_mult_ab_structure_only(kernel, data):
    """Structure-only (values=None) SpGEMM multiplies implicit 1s."""
    A = data.draw(csrs(nrows=st.integers(1, 30), ncols=10, values=False))
    B = data.draw(csrs(nrows=10, ncols=st.integers(1, 30), values=False))
    ref = (to_dense(A) != 0).astype(float) @ (to_dense(B) != 0).astype(float)
    with use_kernel(kernel):
        C = A.multiply(B)
    _check_product(C, ref)


@settings(max_examples=6)
@given(st.data())
def test_mult_ab_sharded(kernel, data):
    """Capacity-sharded SpGEMM (reference: tests/test_mkl.py:76-91)."""
    A, B = data.draw(mm_pairs(max_shape=(40, 20, 30)))
    row_max = int(np.diff(np.asarray(A.rowptrs)).max(initial=0))
    if row_max == 0 or A.nnz == 0:
        return
    from csr_tpu.kernels import get_kernel

    k = get_kernel(kernel)
    old = k.max_nnz
    try:
        k.max_nnz = max(row_max, 3)
        ref = to_dense(A) @ to_dense(B)
        with use_kernel(kernel):
            C = A.multiply(B)
    finally:
        k.max_nnz = old
    _check_product(C, ref)


def test_product_filters_zeros(kernel):
    """Explicitly-cancelling products are dropped
    (reference: csr/csr.py:553-556)."""
    from csr_tpu import CSR

    A = CSR.from_coo(
        np.array([0, 0]), np.array([0, 1]), np.array([1.0, -1.0]), (1, 2)
    )
    B = CSR.from_coo(
        np.array([0, 1]), np.array([0, 0]), np.array([1.0, 1.0]), (2, 1)
    )
    with use_kernel(kernel):
        C = A.multiply(B)
    # 1*1 + (-1)*1 = 0 -> stored nnz must be 0
    assert C.nnz == 0
