"""Transform/subset/pick/sort/shard tests (reference: tests/test_transform.py)."""

import numpy as np
from hypothesis import assume, given
import hypothesis.strategies as st

from csr_tpu import CSR
from csr_tpu.test_utils import csrs
from util import to_dense, tols


@given(csrs(values="normal"))
def test_center_rows(csr):
    dense = to_dense(csr)
    means = np.asarray(csr.normalize_rows("center"))
    t = tols(means.dtype)
    for i in range(csr.nrows):
        nz = dense[i] != 0
        if nz.sum():
            np.testing.assert_allclose(means[i], dense[i][nz].mean(), **t)
    d2 = to_dense(csr)
    for i in range(csr.nrows):
        nz = dense[i] != 0
        if nz.sum():
            np.testing.assert_allclose(
                d2[i][nz], dense[i][nz] - dense[i][nz].mean(),
                rtol=t["rtol"], atol=t["atol"] * max(1, np.abs(dense[i]).max()),
            )


@given(csrs(values="normal"))
def test_unit_rows(csr):
    dense = to_dense(csr)
    norms = np.asarray(csr.normalize_rows("unit"))
    t = tols(norms.dtype)
    for i in range(csr.nrows):
        nz = dense[i] != 0
        if nz.sum():
            np.testing.assert_allclose(
                norms[i], np.linalg.norm(dense[i][nz]),
                rtol=t["rtol"], atol=t["atol"] * max(1, np.abs(dense[i]).max()),
            )
            # resulting row is a unit vector (the subnormal-safe pre-scaling
            # keeps this true even for tiny values, reference: csr/transform.py:40-63)
            vs = np.asarray(csr.row_vs(i))
            np.testing.assert_allclose(np.linalg.norm(vs), 1.0, rtol=1e-4)


def test_unit_rows_tiny_values():
    """Pre-normalization prevents underflow when squaring tiny values
    (reference: csr/transform.py:40-63).

    1e-30 is a normal float32, but its square (1e-60) underflows to 0, so
    a naive sum-of-squares norm would be 0 and the "unit" row would blow
    up.  (True subnormal *inputs* may be flushed to zero by XLA itself and
    are out of scope.)"""
    vals = np.array([1e-30, 2e-30, 2e-30], dtype=np.float32)
    m = CSR.from_coo(np.zeros(3, np.int32), np.arange(3, dtype=np.int32), vals, (1, 3))
    norms = np.asarray(m.normalize_rows("unit"))
    vs = np.asarray(m.row_vs(0))
    np.testing.assert_allclose(np.linalg.norm(vs), 1.0, rtol=1e-5)
    np.testing.assert_allclose(norms[0], 3e-30, rtol=1e-4)


def test_normalize_bad():
    m = CSR.empty(2, 2)
    try:
        m.normalize_rows("bogus")
        assert False
    except ValueError:
        pass


@given(st.data())
def test_subset_rows(data):
    csr = data.draw(csrs(nrows=st.integers(2, 50)))
    begin = data.draw(st.integers(0, csr.nrows - 1))
    end = data.draw(st.integers(begin, csr.nrows))
    s = csr.subset_rows(begin, end)
    assert s.nrows == end - begin
    np.testing.assert_allclose(to_dense(s), to_dense(csr)[begin:end], rtol=1e-6)


@given(st.data())
def test_pick_rows(data):
    csr = data.draw(csrs(nrows=st.integers(1, 50)))
    k = data.draw(st.integers(0, 10))
    rows = np.asarray(
        data.draw(st.lists(st.integers(0, csr.nrows - 1), min_size=k, max_size=k)),
        np.int32,
    )
    p = csr.pick_rows(rows)
    assert p.nrows == k
    np.testing.assert_allclose(to_dense(p), to_dense(csr)[rows].reshape(k, csr.ncols), rtol=1e-6)


@given(csrs())
def test_sort_rows(csr):
    dense = to_dense(csr)
    csr.sort_rows()
    rps = np.asarray(csr.rowptrs)
    cis = np.asarray(csr.colinds)
    for i in range(csr.nrows):
        assert np.all(np.diff(cis[rps[i] : rps[i + 1]]) >= 0)
    np.testing.assert_allclose(to_dense(csr), dense, rtol=1e-6)


@given(csrs(values=True))
def test_filter_nnzs(csr):
    rng = np.random.default_rng(42)
    filt = rng.random(csr.nnz) > 0.5
    f = csr.filter_nnzs(filt)
    assert f.nnz == int(filt.sum())
    dense = to_dense(csr)
    vals = np.asarray(csr.values)
    cis = np.asarray(csr.colinds)
    ris = np.asarray(csr.rowinds())
    exp = np.zeros_like(dense)
    for i in np.nonzero(filt)[0]:
        exp[ris[i], cis[i]] += vals[i]
    np.testing.assert_allclose(to_dense(f), exp, rtol=1e-6)


def test_filter_nnzs_bad_length():
    m = CSR.empty(2, 2)
    try:
        m.filter_nnzs(np.array([True] * 5))
        assert False
    except ValueError:
        pass


@given(csrs(values=True))
def test_filter_zeros(csr):
    vals = np.asarray(csr.values)
    if csr.nnz:
        vals = vals.copy()
        vals[:: max(csr.nnz // 3, 1)] = 0
        csr.values = vals
    dense = to_dense(csr)
    csr._filter_zeros()
    assert np.all(np.asarray(csr.values) != 0) or csr.nnz == 0
    np.testing.assert_allclose(to_dense(csr), dense, rtol=1e-6)


@given(st.data())
def test_shard_rows_assemble(data):
    """Capacity sharding invariants (reference: tests/test_transform.py:172-197).

    Shrinking the capacity knob on small matrices is the same pattern we use
    to test multi-device partitioning without a pod."""
    csr = data.draw(csrs(nrows=st.integers(1, 50)))
    assume(csr.nnz > 0)
    row_max = int(np.diff(np.asarray(csr.rowptrs)).max())
    tgt = data.draw(st.integers(max(row_max, 1), csr.nnz + 1))
    shards = csr._shard_rows(tgt)
    assert all(s.nnz <= tgt for s in shards)
    assert sum(s.nrows for s in shards) == csr.nrows
    asm = CSR._assemble_shards(shards)
    assert asm.nnz == csr.nnz
    np.testing.assert_allclose(to_dense(asm), to_dense(csr), rtol=1e-6)


def test_shard_rows_too_big():
    m = CSR.from_coo(
        np.zeros(5, np.int32), np.arange(5, dtype=np.int32), np.ones(5), (2, 5)
    )
    try:
        m._shard_rows(3)
        assert False
    except ValueError:
        pass


@given(csrs())
def test_fill_drop_values(csr):
    csr.fill_values(2.5)
    assert np.all(np.asarray(csr.values) == 2.5)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        csr.drop_values()
    assert csr.values is None
