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
def test_mult_vec_t(kernel, data):
    """Transpose SpMV ``A^T v`` across all kernels (TPU-era contract
    extension; the reference reaches it via transpose + mult_vec,
    reference: csr/kernels/numba/multiply.py:41-57)."""
    csr = data.draw(csrs())
    v = data.draw(finite_arrays(csr.nrows))
    dense = to_dense(csr)
    ref = dense.T @ v
    with use_kernel(kernel):
        y = np.asarray(csr.mult_vec_t(v))
    assert y.shape == (csr.ncols,)
    scale = max(1.0, np.abs(dense).max(initial=0) * np.abs(v).max(initial=0))
    np.testing.assert_allclose(y, ref, rtol=5e-4, atol=1e-4 * scale)


@given(st.data())
def test_mult_vec_t_matches_transpose(kernel, data):
    """A^T v == transpose().mult_vec(v) — the structural identity the
    reference relies on."""
    csr = data.draw(csrs())
    v = data.draw(finite_arrays(csr.nrows))
    with use_kernel(kernel):
        y = np.asarray(csr.mult_vec_t(v))
        yt = np.asarray(csr.transpose().mult_vec(v))
    scale = max(1.0, np.abs(y).max(initial=0))
    np.testing.assert_allclose(y, yt, rtol=5e-4, atol=1e-4 * scale)


def test_mult_vec_t_sharded():
    """Capacity path: shrunken max_nnz forces per-shard transpose
    products summed over the column space."""
    import scipy.sparse as sps

    from csr_tpu.kernels import get_kernel

    rng = np.random.default_rng(3)
    m = sps.random(64, 40, 0.15, format="csr", random_state=rng,
                   dtype=np.float32)
    from csr_tpu import CSR

    csr = CSR.from_scipy(m)
    v = rng.standard_normal(64).astype(np.float32)
    ref = m.T @ v
    k = get_kernel("xla")
    old = k.max_nnz
    try:
        row_max = int(np.diff(np.asarray(csr.rowptrs)).max())
        k.max_nnz = max(row_max, 20)
        with use_kernel("xla"):
            y = np.asarray(csr.mult_vec_t(v))
    finally:
        k.max_nnz = old
    np.testing.assert_allclose(y, ref, rtol=5e-4, atol=1e-4)


def test_mult_vec_t_pallas_wide():
    """The pallas transposed-layout path on a matrix big enough to use
    real micro-block windows, plus layout-cache reuse."""
    import scipy.sparse as sps

    from csr_tpu.kernels import pallas as pk

    rng = np.random.default_rng(9)
    m = sps.random(900, 600, 0.05, format="csr", random_state=rng,
                   dtype=np.float32)
    from csr_tpu import CSR

    csr = CSR.from_scipy(m)
    v = rng.standard_normal(900).astype(np.float32)
    ref = m.T @ v
    with use_kernel("pallas"):
        y = np.asarray(csr.mult_vec_t(v))
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)
        # second call reuses the cached transposed layout
        assert csr._mb_layout_t_cache is not None
        lay = csr._mb_layout_t_cache[3]
        y2 = np.asarray(csr.mult_vec_t(v))
        assert csr._mb_layout_t_cache[3] is lay
        np.testing.assert_allclose(y2, y)


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


def test_sharded_layout_reuse():
    """Repeated over-capacity multiplies repack NOTHING: the shard list is
    cached on the matrix, so each shard's device layout survives across
    calls (the TPU analog of the reference reusing B's handle across
    shards, reference: csr/csr.py:565).  Asserted by counting layout-build
    trace events (round-3 verdict item 5)."""
    import scipy.sparse as sps

    from csr_tpu import CSR, kernels
    from csr_tpu.kernels import get_kernel, use_kernel

    rng = np.random.default_rng(7)
    m = sps.random(256, 192, 0.1, format="csr", random_state=rng)
    csr = CSR.from_scipy(m)
    v = rng.standard_normal(192).astype(np.float32)
    vt = rng.standard_normal(256).astype(np.float32)
    B = rng.standard_normal((192, 8)).astype(np.float32)

    events = []
    kernels._listeners.append(lambda ev, f: events.append(ev))
    k = get_kernel("pallas")
    old = k.max_nnz
    try:
        k.max_nnz = max(int(np.diff(m.indptr).max()), csr.nnz // 3)
        with use_kernel("pallas"):
            y1 = np.asarray(csr.mult_vec(v))
            g1 = np.asarray(csr.mult_vec_t(vt))
            c1 = np.asarray(csr.mult_dense(B))
            n_first = sum(e.startswith("layout-build") for e in events)
            assert n_first > 0  # the capacity path really built layouts
            events.clear()
            y2 = np.asarray(csr.mult_vec(v))
            g2 = np.asarray(csr.mult_vec_t(vt))
            c2 = np.asarray(csr.mult_dense(B))
            assert sum(e.startswith("layout-build") for e in events) == 0
    finally:
        k.max_nnz = old
        kernels._listeners.pop()
    np.testing.assert_allclose(y2, y1)
    np.testing.assert_allclose(g2, g1)
    np.testing.assert_allclose(c2, c1)
    np.testing.assert_allclose(y1, m @ v, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(g1, m.T @ vt, rtol=1e-4, atol=1e-4)


def test_spmv_large_chunk_panel(monkeypatch):
    """Matrices whose operand/output exceed the VMEM windows budget run
    the chunk/panel micro-block path (round-3 verdict item 3) — not the
    ~1000x-slower XLA gather fallback.  Shrinking _VMEM_WINDOWS forces
    the path at test size (the reference's mkl_lim capacity-knob pattern,
    tests/test_mkl.py:29-38)."""
    import scipy.sparse as sps

    from csr_tpu import CSR
    from csr_tpu.kernels import get_kernel, pallas

    monkeypatch.setattr(pallas, "_VMEM_WINDOWS", 2)
    rng = np.random.default_rng(3)
    # 640 cols = 5 windows -> 3 column panels; 512 rows = 4 windows -> 2
    # row chunks.  Both directions exercise chunking and panelling.
    m = sps.random(512, 640, 0.03, format="csr", random_state=rng)
    csr = CSR.from_scipy(m)
    v = rng.standard_normal(640).astype(np.float32)
    vt = rng.standard_normal(512).astype(np.float32)

    k = get_kernel("pallas")
    h = k.to_handle(csr)
    y = np.asarray(k.mult_vec(h, v))
    np.testing.assert_allclose(y, m @ v, rtol=1e-4, atol=1e-4)
    g = np.asarray(k.mult_vec_t(h, vt))
    np.testing.assert_allclose(g, m.T @ vt, rtol=1e-4, atol=1e-4)

    # layouts are cached on the matrix: a second call rebuilds nothing
    from csr_tpu import kernels as kmod

    events = []
    kmod._listeners.append(lambda ev, f: events.append(ev))
    try:
        np.testing.assert_allclose(np.asarray(k.mult_vec(h, v)), y)
        np.testing.assert_allclose(np.asarray(k.mult_vec_t(h, vt)), g)
        assert not any(e.startswith("layout-build") for e in events)
    finally:
        kmod._listeners.pop()
    k.release_handle(h)


def test_spmv_wide_3m_cols():
    """ncols ~ 3M: beyond the whole-operand VMEM budget at the real
    _VMEM_WINDOWS — the silent cliff the round-3 verdict flagged.  Sparse
    enough to stay fast in interpret mode."""
    from csr_tpu import CSR
    from csr_tpu.kernels import get_kernel

    rng = np.random.default_rng(5)
    nrows, ncols, npr = 64, 3_000_000, 32
    nnz = nrows * npr
    rowptr = np.arange(nrows + 1, dtype=np.int64) * npr
    cols = np.sort(
        rng.choice(ncols, nnz, replace=True).astype(np.int32).reshape(
            nrows, npr
        ), axis=1,
    ).reshape(-1)
    vals = rng.standard_normal(nnz).astype(np.float32)
    csr = CSR(nrows, ncols, nnz, rowptr, cols, vals)
    x = rng.standard_normal(ncols).astype(np.float32)

    k = get_kernel("pallas")
    h = k.to_handle(csr)
    y = np.asarray(k.mult_vec(h, x))
    ref = np.zeros(nrows)
    for r in range(nrows):
        s = slice(r * npr, (r + 1) * npr)
        ref[r] = np.dot(vals[s].astype(np.float64), x[cols[s]])
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)
    k.release_handle(h)


def test_spmv_double_window_wide():
    """Exercise the 256-column double-window kernel path with columns that
    actually land in the upper half of a window (lo >= 128), which tiny
    hypothesis matrices cannot reach."""
    import scipy.sparse as sps
    import jax.numpy as jnp

    from csr_tpu import CSR
    from csr_tpu.ops import microblock as mb, spmv as spmv_op

    rng = np.random.default_rng(7)
    m = sps.random(500, 3000, 0.04, format="csr", random_state=rng,
                   dtype=np.float32)
    csr = CSR.from_scipy(m)
    x = rng.standard_normal(3000).astype(np.float32)
    ref = m @ x
    for window in (128, 256):
        for pair in (1, 2, 4):
            lay = mb.build_microblocks(csr, window=window, pair=pair)
            assert lay.window == window and lay.pair == pair
            y = np.asarray(spmv_op.spmv(lay, jnp.asarray(x), interpret=True))
            np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_spmm_double_window_wide():
    import scipy.sparse as sps
    import jax.numpy as jnp

    from csr_tpu import CSR
    from csr_tpu.ops import microblock as mb, spmm as spmm_op

    rng = np.random.default_rng(8)
    m = sps.random(300, 2500, 0.05, format="csr", random_state=rng,
                   dtype=np.float32)
    csr = CSR.from_scipy(m)
    B = rng.standard_normal((2500, 64)).astype(np.float32)
    ref = m @ B
    for window in (128, 256):
        lay = mb.build_microblocks(csr, window=window)
        C = np.asarray(spmm_op.spmm(lay, jnp.asarray(B), interpret=True))
        np.testing.assert_allclose(C, ref, rtol=1e-5, atol=1e-4)
