"""Internal tests for the ESC SpGEMM machinery (csr_tpu/ops/spgemm.py).

The analog of the reference's SMMP symbolic-pass unit tests
(reference: tests/test_kernel_numba.py:14-30): the chunk planner and the
expand/compress passes are checked directly against their invariants,
independent of the end-to-end product tests in test_multiply.py.
"""

import numpy as np
import scipy.sparse as sps
import pytest
from hypothesis import given, settings
import hypothesis.strategies as st

from csr_tpu import CSR
from csr_tpu.ops import spgemm
from csr_tpu.test_utils import mm_pairs
from util import to_dense


@given(mm_pairs(max_shape=(40, 30, 40)))
def test_chunk_splits_invariants(pair):
    """Chunk split points cover all rows, are strictly increasing, and no
    chunk expands past the budget (except unavoidable single rows)."""
    A, B = pair
    a_rps = np.asarray(A.rowptrs)
    b_nnz = np.diff(np.asarray(B.rowptrs))
    a_cols = np.asarray(A.colinds)

    old = spgemm.esc_chunk_entries
    try:
        spgemm.esc_chunk_entries = 16
        splits = spgemm._chunk_splits(a_rps, b_nnz, a_cols)
    finally:
        spgemm.esc_chunk_entries = old

    assert splits[0] == 0
    assert splits[-1] == A.nrows
    assert all(b > a for a, b in zip(splits[:-1], splits[1:]))

    # per-chunk expansion size within budget unless the chunk is 1 row
    per_entry = b_nnz[a_cols]
    per_row = np.zeros(A.nrows, dtype=np.int64)
    np.add.at(per_row, np.repeat(np.arange(A.nrows), np.diff(a_rps)),
              per_entry)
    for lo, hi in zip(splits[:-1], splits[1:]):
        ex = int(per_row[lo:hi].sum())
        assert ex <= 16 or hi - lo == 1


@settings(max_examples=25)
@given(mm_pairs(max_shape=(30, 20, 30)))
def test_esc_rows_structure(pair):
    """The single-chunk ESC product has sorted, in-range, duplicate-free
    coordinates and valid rowptrs (the SMMP symbolic-pass invariants,
    reference: tests/test_kernel_numba.py:14-30)."""
    A, B = pair
    C = spgemm.esc_mult_ab(A, B)

    rps = np.asarray(C.rowptrs)
    cis = np.asarray(C.colinds)
    assert C.nrows == A.nrows and C.ncols == B.ncols
    assert rps[0] == 0 and rps[-1] == C.nnz
    assert np.all(np.diff(rps) >= 0)
    if C.nnz:
        assert cis.min() >= 0 and cis.max() < B.ncols
        # within each row: strictly increasing columns (sorted, deduped)
        for r in range(C.nrows):
            row_cols = cis[rps[r]: rps[r + 1]]
            assert np.all(np.diff(row_cols) > 0)

    ref = to_dense(A) @ to_dense(B)
    got = np.zeros_like(ref)
    vals = np.asarray(C.values)
    for r in range(C.nrows):
        got[r, cis[rps[r]: rps[r + 1]]] = vals[rps[r]: rps[r + 1]]
    np.testing.assert_allclose(got, ref, rtol=1e-4,
                               atol=1e-5 * max(1.0, np.abs(ref).max()))


def test_esc_empty_operands():
    """Zero-nnz operands short-circuit without device work."""
    A = CSR.from_coo([], [], None, (5, 4))
    B = CSR.from_coo([0], [2], [3.0], (4, 6))
    C = spgemm.esc_mult_ab(A, B)
    assert C.nnz == 0 and C.nrows == 5 and C.ncols == 6
    # A nonempty, B empty: expansion size 0
    C2 = spgemm.esc_mult_ab(B, CSR.from_coo([], [], None, (6, 3)))
    assert C2.nnz == 0 and (C2.nrows, C2.ncols) == (4, 3)


def test_esc_abt_matches_ab_transpose():
    rng = np.random.default_rng(3)
    A = sps.random(25, 18, 0.2, format="csr", random_state=rng,
                   dtype=np.float32)
    B = sps.random(30, 18, 0.2, format="csr", random_state=rng,
                   dtype=np.float32)
    C = spgemm.esc_mult_abt(CSR.from_scipy(A), CSR.from_scipy(B))
    ref = (A @ B.T).toarray()
    got = C.to_scipy().toarray()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_dense_fits_budget_boundary():
    old = spgemm.max_dense_elems
    try:
        spgemm.max_dense_elems = 100
        assert spgemm.dense_fits(10, 10, 10, 10)        # both exactly 100
        assert not spgemm.dense_fits(11, 10, 10, 10)    # product too big
        assert not spgemm.dense_fits(10, 10, 11, 10)    # B too big
    finally:
        spgemm.max_dense_elems = old
