"""
Static default kernel interface (reference: csr/kernel.py).

Freezes the default kernel's entry points at import time, for code that
wants a stable, non-dynamic binding (the analog of the reference's
Numba-client module; here it is mostly a convenience namespace).
"""

from csr_tpu.kernels import _default_kernel

_kernel = _default_kernel()

name = _kernel.__name__
to_handle = _kernel.to_handle
from_handle = _kernel.from_handle
release_handle = _kernel.release_handle
order_columns = _kernel.order_columns
mult_ab = _kernel.mult_ab
mult_abt = _kernel.mult_abt
mult_vec = _kernel.mult_vec
mult_vec_t = _kernel.mult_vec_t
mult_dense = _kernel.mult_dense
max_nnz = _kernel.max_nnz
