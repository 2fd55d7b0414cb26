"""Micro-block layout invariant tests.

The analog of the reference's direct SMMP symbolic-pass unit tests
(reference: tests/test_kernel_numba.py:14-30): verify the Pallas kernels'
data layout directly, for both the 128- and 256-column window variants.
"""

import numpy as np
import pytest
from hypothesis import given
import hypothesis.strategies as st

from csr_tpu.ops.microblock import (
    LANE, build_microblocks, build_microblocks_host, choose_layout,
    choose_window, estimate_microrows,
)
from csr_tpu.test_utils import csrs
from util import to_dense


@pytest.mark.parametrize("window,pair", [(128, 1), (128, 2), (256, 1), (256, 4)])
@given(csr=csrs(values=True))
def test_microblock_invariants(window, pair, csr):
    mb = build_microblocks(csr, window=window, pair=pair)
    assert mb.window == window
    assert mb.pair == pair
    shift = window.bit_length() - 1
    vals = np.asarray(mb.vals)
    lo, epos = mb.unpack_meta()
    rbcb = np.asarray(mb.rbcb)

    assert vals.shape == lo.shape == epos.shape
    assert np.asarray(mb.meta).dtype == np.uint16
    assert vals.shape[1] == LANE
    assert mb.n_microrows <= vals.shape[0]

    # epos rows are monotone prefix counts ending at the micro-row's entry count
    assert np.all(np.diff(epos, axis=1) >= 0)
    assert np.all(epos >= 0)
    assert np.all(epos[:, -1] <= LANE)
    assert np.all(lo < window)

    # every window coordinate is in range
    rb = rbcb >> 16
    cb = rbcb & 0xFFFF
    assert np.all(rb >= 0)
    assert np.all(cb >= 0)

    # kernel invariant: every aligned ACC_GROUP-micro-row accumulation
    # group shares one row window (stripe padding guarantees it)
    from csr_tpu.ops.microblock import ACC_GROUP

    ngrp = (len(rb) // ACC_GROUP) * ACC_GROUP
    rbg = rb[:ngrp].reshape(-1, ACC_GROUP)
    assert np.all(rbg == rbg[:, :1])

    # pair-mode invariant: aligned pair-length micro-row runs share one
    # column window (the build loop issues one operand address per run)
    cbp = cb.reshape(-1, pair)
    assert np.all(cbp == cbp[:, :1])
    if csr.nnz:
        assert rb.max() <= (csr.nrows - 1) >> 7
        assert cb.max() <= (csr.ncols - 1) >> shift

    # reconstruct the dense matrix from the layout: every stored entry
    # appears exactly once with its window-local coordinates
    dense = np.zeros((mb.rb_count * LANE, mb.cb_count * LANE))
    m = mb.n_microrows
    for mr in range(m):
        counts = np.diff(np.concatenate([[0], epos[mr]]))
        local_rows = np.repeat(np.arange(LANE), counts)
        n = len(local_rows)
        for s in range(n):
            r = (rb[mr] << 7) + local_rows[s]
            c = (cb[mr] << shift) + lo[mr, s]
            dense[r, c] += vals[mr, s]
        # padding slots hold zero values
        assert np.all(vals[mr, n:] == 0)

    ref = to_dense(csr)
    np.testing.assert_allclose(
        dense[: csr.nrows, : csr.ncols], ref, rtol=1e-5,
        atol=1e-5 * max(1.0, np.abs(ref).max(initial=0)),
    )


@given(csrs())
def test_microblock_fill(csr):
    mb = build_microblocks(csr)
    if csr.nnz:
        assert 0 < mb.fill <= 1.0


@given(csrs())
def test_layout_chooser(csr):
    """The chooser picks a valid (window, pair) and its estimates match
    the builds."""
    rp = np.asarray(csr.rowptrs)
    cols = np.asarray(csr.colinds)
    w, p = choose_layout(rp, cols)
    assert w in (128, 256) and p in (1, 2, 4)
    assert choose_window(rp, cols) == w
    for window in (128, 256):
        for pair in (1, 2, 4):
            est = estimate_microrows(rp, cols, window, pair=pair)
            built = build_microblocks(csr, window=window, pair=pair)
            assert est == built.n_microrows


@pytest.mark.parametrize("window", [128, 256])
@given(csr=csrs())
def test_native_plan3_matches_plan(window, csr):
    """csrt_mb_plan3's three counts equal three csrt_mb_plan calls.

    plan3 hand-inlines the group/stripe walk with three accumulators; if
    the padding semantics of the walk ever drift, the layout chooser's
    counts silently desync from what csrt_mb_fill builds — this pins
    them together (advisor finding, round 3)."""
    from csr_tpu import native
    from csr_tpu.ops.microblock import ACC_GROUP

    if not native.available():
        pytest.skip("native library unavailable")
    if csr.nnz == 0:
        return
    rp = np.asarray(csr.rowptrs)
    cols = np.asarray(csr.colinds)
    m3 = native.plan_microrows3(csr.nrows, csr.ncols, rp, cols, window,
                                ACC_GROUP)
    assert m3 is not None
    for pair, m in zip((1, 2, 4), m3):
        assert m == native.plan_microrows(
            csr.nrows, csr.ncols, rp, cols, window, ACC_GROUP, pair
        )
        assert m == estimate_microrows(rp, cols, window, csr.ncols, pair)


def test_bad_pair_rejected():
    rp = np.array([0, 2], np.int64)
    cols = np.array([0, 5], np.int32)
    with pytest.raises(AssertionError):
        estimate_microrows(rp, cols, 128, pair=3)


@pytest.mark.parametrize("window,pair", [(128, 1), (128, 2), (256, 1), (256, 4)])
@given(csr=csrs(values=True))
def test_native_build_matches_numpy(window, pair, csr):
    """The C++ layout builder is bit-exact with the numpy reference
    (the native module's role, reference: csr/kernels/mkl/mkl_ops.c)."""
    from csr_tpu import native
    from csr_tpu.ops.microblock import MR_BLOCK

    if not native.available():
        pytest.skip("native library unavailable")
    if csr.nnz == 0:
        return
    rp = np.asarray(csr.rowptrs)
    cols = np.asarray(csr.colinds)
    vals = None if csr.values is None else np.asarray(csr.values)
    from csr_tpu.ops.microblock import ACC_GROUP

    nat = native.build_microblocks(
        csr.nrows, csr.ncols, rp, cols, vals, MR_BLOCK, window, ACC_GROUP,
        pair,
    )
    assert nat is not None

    saved = native.build_microblocks
    native.build_microblocks = lambda *a, **k: None
    try:
        ref = build_microblocks_host(
            csr.nrows, csr.ncols, rp, cols, vals, window=window, pair=pair
        )
    finally:
        native.build_microblocks = saved

    v, meta, rbcb, m = nat
    assert m == ref.n_microrows
    np.testing.assert_array_equal(meta, np.asarray(ref.meta))
    np.testing.assert_array_equal(rbcb, np.asarray(ref.rbcb))
    np.testing.assert_array_equal(v, np.asarray(ref.vals))
