"""SpMV tests over all kernels (reference: tests/test_mult_vec.py)."""

import numpy as np
from hypothesis import given, settings
import hypothesis.strategies as st

from csr_tpu.kernels import use_kernel
from csr_tpu.test_utils import csrs, finite_arrays
from util import to_dense


@given(st.data())
def test_mult_vec(kernel, data):
    csr = data.draw(csrs())
    v = data.draw(finite_arrays(csr.ncols))
    dense = to_dense(csr)
    ref = dense @ v
    with use_kernel(kernel):
        y = np.asarray(csr.mult_vec(v))
    assert y.shape == (csr.nrows,)
    scale = max(1.0, np.abs(dense).max(initial=0) * np.abs(v).max(initial=0))
    np.testing.assert_allclose(y, ref, rtol=5e-4, atol=1e-4 * scale)


@given(st.data())
def test_mult_vec_structure_only(kernel, data):
    csr = data.draw(csrs(values=False))
    v = data.draw(finite_arrays(csr.ncols))
    ref = (to_dense(csr) != 0).astype(np.float64) @ v
    with use_kernel(kernel):
        y = np.asarray(csr.mult_vec(v))
    np.testing.assert_allclose(y, ref, rtol=5e-4, atol=1e-4 * max(1, np.abs(v).max(initial=0)))


def test_mult_vec_shape_mismatch(kernel):
    from csr_tpu import CSR

    m = CSR.empty(3, 4)
    with use_kernel(kernel):
        try:
            m.mult_vec(np.ones(5))
            assert False
        except AssertionError:
            pass


@given(st.data())
def test_mult_vec_sharded(kernel, data):
    """Force the capacity-sharding path with a shrunken max_nnz
    (the reference's mkl_lim pattern, tests/test_mkl.py:29-38)."""
    csr = data.draw(csrs(nnz=st.integers(10, 200)))
    row_max = int(np.diff(np.asarray(csr.rowptrs)).max(initial=0))
    if row_max == 0:
        return
    from csr_tpu.kernels import get_kernel

    k = get_kernel(kernel)
    old = k.max_nnz
    try:
        k.max_nnz = max(row_max, 5)
        v = data.draw(finite_arrays(csr.ncols))
        ref = to_dense(csr) @ v
        with use_kernel(kernel):
            y = np.asarray(csr.mult_vec(v))
    finally:
        k.max_nnz = old
    scale = max(1.0, np.abs(ref).max(initial=0))
    np.testing.assert_allclose(y, ref, rtol=5e-4, atol=1e-4 * scale)
