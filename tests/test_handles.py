"""Kernel handle lifecycle tests (reference: tests/test_handles.py)."""

import numpy as np
from hypothesis import given

from csr_tpu.kernels import get_kernel, releasing
from csr_tpu.test_utils import csrs
from util import to_dense


@given(csrs())
def test_handle_roundtrip(kernel, csr):
    k = get_kernel(kernel)
    with releasing(k.to_handle(csr), k) as h:
        c2 = k.from_handle(h)
    np.testing.assert_allclose(to_dense(c2), to_dense(csr), rtol=1e-6)


@given(csrs())
def test_order_columns(kernel, csr):
    k = get_kernel(kernel)
    dense = to_dense(csr)
    with releasing(k.to_handle(csr), k) as h:
        k.order_columns(h)
        c2 = k.from_handle(h)
    rps = np.asarray(c2.rowptrs)
    cis = np.asarray(c2.colinds)
    for i in range(c2.nrows):
        assert np.all(np.diff(cis[rps[i] : rps[i + 1]]) >= 0)
    np.testing.assert_allclose(to_dense(c2), dense, rtol=1e-6)


def test_max_nnz(kernel):
    k = get_kernel(kernel)
    assert k.max_nnz > 0
