"""SpMM (sparse x dense) tests over all kernels.

``mult_dense`` is the TPU-era extension of the kernel contract; on the
pallas backend it runs the MXU micro-block kernel (csr_tpu/ops/spmm.py).
"""

import numpy as np
from hypothesis import given
import hypothesis.strategies as st

from csr_tpu.kernels import use_kernel
from csr_tpu.test_utils import csrs, finite_arrays
from util import to_dense


@given(st.data())
def test_mult_dense(kernel, data):
    csr = data.draw(csrs())
    n = data.draw(st.integers(1, 20))
    B = data.draw(finite_arrays((csr.ncols, n)))
    ref = to_dense(csr) @ B
    with use_kernel(kernel):
        C = np.asarray(csr.mult_dense(B))
    assert C.shape == (csr.nrows, n)
    scale = max(1.0, np.abs(ref).max(initial=0))
    np.testing.assert_allclose(C, ref, rtol=5e-4, atol=1e-4 * scale)


@given(st.data())
def test_mult_dense_structure_only(kernel, data):
    csr = data.draw(csrs(values=False))
    B = data.draw(finite_arrays((csr.ncols, 3)))
    ref = (to_dense(csr) != 0).astype(float) @ B
    with use_kernel(kernel):
        C = np.asarray(csr.mult_dense(B))
    scale = max(1.0, np.abs(ref).max(initial=0))
    np.testing.assert_allclose(C, ref, rtol=5e-4, atol=1e-4 * scale)


def test_mult_dense_wide_multitile(monkeypatch):
    """B wider than one N_TILE (n > 128) through the micro-block KERNEL
    path — the multi-tile grid dimension (round-3 verdict item 10).
    Densify routing is disabled so the Pallas SpMM really runs."""
    import scipy.sparse as sps

    from csr_tpu import CSR
    from csr_tpu.kernels import get_kernel, pallas

    monkeypatch.setattr(pallas, "_DENSIFY_MAX_ELEMS", 1)  # never densify
    rng = np.random.default_rng(2)
    m = sps.random(384, 520, 0.05, format="csr", random_state=rng,
                   dtype=np.float32)
    csr = CSR.from_scipy(m)
    B = rng.standard_normal((520, 300)).astype(np.float32)  # 3 N_TILEs
    k = get_kernel("pallas")
    h = k.to_handle(csr)
    assert pallas._spmm_viable(csr, csr.nrows)
    C = np.asarray(k.mult_dense(h, B))
    k.release_handle(h)
    ref = m @ B
    scale = max(1.0, np.abs(ref).max(initial=0))
    np.testing.assert_allclose(C, ref, rtol=5e-4, atol=1e-4 * scale)


def test_mult_dense_viability_boundary(monkeypatch):
    """_spmm_viable must reject working sets beyond the scoped-VMEM model
    and the backend must still produce the right answer via XLA."""
    from csr_tpu import CSR
    from csr_tpu.kernels import get_kernel, pallas

    rng = np.random.default_rng(4)
    # tiny nnz, enormous column space: B/out panels cannot be VMEM-resident
    ncols = 3_400_000
    rowptr = np.array([0, 2, 4, 5, 6], np.int64)
    cols = np.array([5, ncols - 1, 17, 1_000_000, 0, 2_000_000], np.int32)
    vals = np.arange(1, 7, dtype=np.float32)
    csr = CSR(4, ncols, 6, rowptr, cols, vals)
    assert not pallas._spmm_viable(csr, csr.nrows)
    monkeypatch.setattr(pallas, "_DENSIFY_MAX_ELEMS", 1)
    B = np.zeros((ncols, 2), np.float32)
    B[cols] = rng.standard_normal((6, 2))
    k = get_kernel("pallas")
    h = k.to_handle(csr)
    C = np.asarray(k.mult_dense(h, B))
    k.release_handle(h)
    ref = np.zeros((4, 2))
    for r in range(4):
        for s in range(rowptr[r], rowptr[r + 1]):
            ref[r] += vals[s] * B[cols[s]]
    np.testing.assert_allclose(C, ref, rtol=1e-5, atol=1e-5)


def test_mult_dense_densify_routing(monkeypatch):
    """Both sides of the _DENSIFY_MIN_DENSITY routing edge give the same
    (correct) product; the dense path really caches a densified form."""
    import scipy.sparse as sps

    from csr_tpu import CSR
    from csr_tpu.kernels import get_kernel, pallas

    monkeypatch.setattr(pallas, "_DENSIFY_MIN_DENSITY", 0.05)
    rng = np.random.default_rng(6)
    k = get_kernel("pallas")
    for density, wants_dense in ((0.01, False), (0.2, True)):
        m = sps.random(200, 160, density, format="csr", random_state=rng,
                       dtype=np.float32)
        csr = CSR.from_scipy(m)
        assert pallas._dense_affordable(csr) == wants_dense
        B = rng.standard_normal((160, 24)).astype(np.float32)
        h = k.to_handle(csr)
        C = np.asarray(k.mult_dense(h, B))
        assert (h._dense is not None) == wants_dense
        k.release_handle(h)
        ref = m @ B
        scale = max(1.0, np.abs(ref).max(initial=0))
        np.testing.assert_allclose(C, ref, rtol=5e-4, atol=1e-4 * scale)


@given(st.data())
def test_mult_dense_sharded(kernel, data):
    csr = data.draw(csrs(nnz=st.integers(10, 150)))
    row_max = int(np.diff(np.asarray(csr.rowptrs)).max(initial=0))
    if row_max == 0:
        return
    from csr_tpu.kernels import get_kernel

    k = get_kernel(kernel)
    old = k.max_nnz
    try:
        k.max_nnz = max(row_max, 5)
        B = data.draw(finite_arrays((csr.ncols, 4)))
        ref = to_dense(csr) @ B
        with use_kernel(kernel):
            C = np.asarray(csr.mult_dense(B))
    finally:
        k.max_nnz = old
    scale = max(1.0, np.abs(ref).max(initial=0))
    np.testing.assert_allclose(C, ref, rtol=5e-4, atol=1e-4 * scale)
