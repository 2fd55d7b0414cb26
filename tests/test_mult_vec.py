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
