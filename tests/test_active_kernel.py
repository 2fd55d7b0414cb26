"""Kernel registry tests (reference: tests/test_active_kernel.py)."""

import pytest

from csr_tpu.kernels import get_kernel, set_kernel, use_kernel


def test_get_kernel_by_name():
    k = get_kernel("xla")
    assert k.__name__.endswith("xla")


def test_get_default():
    k = get_kernel()
    assert hasattr(k, "mult_vec")
    assert hasattr(k, "max_nnz")


def test_set_kernel():
    try:
        set_kernel("scipy")
        k = get_kernel()
        assert k.__name__.endswith("scipy")
    finally:
        set_kernel(None)


def test_use_kernel_restores():
    before = get_kernel()
    with use_kernel("scipy"):
        assert get_kernel().__name__.endswith("scipy")
        with use_kernel("xla"):
            assert get_kernel().__name__.endswith("xla")
        assert get_kernel().__name__.endswith("scipy")
    assert get_kernel() is before


def test_reference_aliases():
    """Reference kernel names map onto our backends."""
    assert get_kernel("numba").__name__.endswith("xla")
    assert get_kernel("mkl").__name__.endswith("pallas")


def test_unknown_kernel():
    with pytest.raises(ImportError):
        get_kernel("definitely_not_a_kernel")


def test_kernel_module_contract():
    """Every backend exposes the full 8-symbol contract
    (reference: docs/kernels.rst)."""
    for name in ("scipy", "xla", "pallas"):
        k = get_kernel(name)
        for sym in (
            "to_handle", "from_handle", "release_handle", "order_columns",
            "mult_vec", "mult_ab", "mult_abt", "max_nnz",
        ):
            assert hasattr(k, sym), (name, sym)
