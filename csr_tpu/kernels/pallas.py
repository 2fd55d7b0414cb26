"""
Pallas TPU kernel backend — the tuned device backend (the role the MKL
vendor kernel plays in the reference, csr/kernels/mkl/).

``to_handle`` performs the device layout work (micro-block packing, see
:mod:`csr_tpu.ops.microblock`) the way the MKL kernel's ``to_handle``
normalizes dtypes and builds MKL handles
(reference: csr/kernels/mkl/handle.py:61-70).  Handles own device buffers;
``release_handle`` drops them eagerly.

SpMV runs the micro-block Pallas kernel (:mod:`csr_tpu.ops.spmv`).
SpGEMM uses output densification (:mod:`csr_tpu.kernels.xla`), which on
TPU maps the irregular SMMP work onto dense vector/matrix units.

On hosts without a TPU the Pallas kernels run in interpreter mode, which
is this backend's analog of the reference's ``NUMBA_DISABLE_JIT`` testing
mode (reference: .github/workflows/test.yml:72-80).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from csr_tpu.kernels import trace, xla as _xla
from csr_tpu.ops import microblock, spmm as _spmm_op, spmv as _spmv_op

# Per-operation capacity.  The micro-block arrays cost 6 B/slot plus
# padding; cap handles at ~1/4 of a 16 GB HBM (the same role as the MKL
# kernel's int32 max_nnz capacity contract, reference: csr/kernels/mkl/__init__.py:5).
max_nnz = 512 * 1024 * 1024

#: rows/cols ceiling for the VMEM-resident dense operand & output (per 128-window)
_VMEM_WINDOWS = 16 * 1024


def _interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


def _cached_layout(csr) -> microblock.MicroBlockLayout:
    """Micro-block layout for ``csr``, cached on the CSR object.

    The layout build is the expensive ``to_handle`` preprocessing (host
    sort + pack, seconds at 10M nnz), and the reference's API creates a
    fresh handle per ``mult_vec``/``multiply`` call (csr/csr.py:581-583) —
    without a cache every high-level call would pay the build.  The cache
    key is the *identity* of the three buffers, so in-place ops that
    replace them (``sort_rows``) invalidate naturally.  (Like MKL handles
    aliasing numpy buffers, reference csr/kernels/mkl/handle.py:55,
    externally mutating a buffer's contents in place would go stale.)"""
    cached = getattr(csr, "_mb_layout_cache", None)
    if (
        cached is not None
        and cached[0] is csr.rowptrs
        and cached[1] is csr.colinds
        and cached[2] is csr.values
    ):
        return cached[3]
    layout = microblock.build_microblocks(csr)
    trace(
        "layout-build",
        nnz=layout.nnz,
        microrows=layout.n_microrows,
        fill=round(layout.fill, 3),
        bytes=layout.nbytes,
    )
    try:
        csr._mb_layout_cache = (csr.rowptrs, csr.colinds, csr.values, layout)
    except AttributeError:
        pass
    return layout


def _cached_layout_t(csr) -> microblock.MicroBlockLayout:
    """Micro-block layout of ``csr`` TRANSPOSED, cached on the CSR object
    (same identity-keyed scheme as :func:`_cached_layout`).

    The transpose itself is host preprocessing (native C++ when
    available), the TPU analog of the reference's transpose-then-multiply
    structure (reference: csr/kernels/numba/multiply.py:41-57)."""
    cached = getattr(csr, "_mb_layout_t_cache", None)
    if (
        cached is not None
        and cached[0] is csr.rowptrs
        and cached[1] is csr.colinds
        and cached[2] is csr.values
    ):
        return cached[3]

    host = getattr(csr, "_host", None)
    if host is not None:
        rp, cis, vals = host
    else:
        rp = np.asarray(csr.rowptrs)
        cis = np.asarray(csr.colinds)
        vals = None if csr.values is None else np.asarray(csr.values)
    from csr_tpu import native

    vals32 = None if vals is None else np.asarray(vals, np.float32)
    t_rps, t_cis, t_vls = native.transpose_host(
        csr.nrows, csr.ncols, rp, cis, vals32
    )
    layout = microblock.build_microblocks_host(
        csr.ncols, csr.nrows, t_rps, t_cis, t_vls
    )
    trace(
        "layout-build-t",
        nnz=layout.nnz,
        microrows=layout.n_microrows,
        fill=round(layout.fill, 3),
        bytes=layout.nbytes,
    )
    try:
        csr._mb_layout_t_cache = (csr.rowptrs, csr.colinds, csr.values, layout)
    except AttributeError:
        pass
    return layout


class PallasHandle:
    """Device handle: the CSR plus its (lazily built) device forms —
    micro-block layout for SpMV, dense form for MXU SpMM/SpGEMM."""

    __slots__ = ("csr", "_layout", "_layout_t", "_xla_handle", "_dense",
                 "_dense64")

    def __init__(self, csr):
        self.csr = csr
        self._layout = None
        self._layout_t = None
        self._xla_handle = None
        self._dense = None
        self._dense64 = None

    @property
    def layout(self) -> microblock.MicroBlockLayout:
        if self._layout is None:
            self._layout = _cached_layout(self.csr)
        return self._layout

    @property
    def layout_t(self) -> microblock.MicroBlockLayout:
        if self._layout_t is None:
            self._layout_t = _cached_layout_t(self.csr)
        return self._layout_t

    @property
    def xla_handle(self):
        if self._xla_handle is None:
            self._xla_handle = _xla.to_handle(self.csr)
        return self._xla_handle

    @property
    def dense(self):
        """f32 densified matrix, cached on the handle (MKL-style: the
        handle owns the preprocessed device form)."""
        if self._dense is None:
            c = self.csr
            bx = self.xla_handle
            self._dense = _xla._densify(
                c._required_values(), c.colinds, bx.row_ids,
                c.nrows, c.ncols, jnp.float32,
            )
        return self._dense

    @property
    def dense64(self):
        """f64 densified matrix, cached on the handle.  Affordable f64
        products route through this form: emulated dense f64 (1.5
        TFLOP/s matmul on v5e) beats the gather/scatter f64 sparse
        formulations ~2x above ~6e-3 density — docs/perf.md round 5."""
        if self._dense64 is None:
            c = self.csr
            bx = self.xla_handle
            self._dense64 = _xla._densify(
                c._required_values(), c.colinds, bx.row_ids,
                c.nrows, c.ncols, jnp.float64,
            )
        return self._dense64


def to_handle(csr):
    trace("to_handle", kernel="pallas", shape=(csr.nrows, csr.ncols), nnz=csr.nnz)
    return PallasHandle(csr)


def from_handle(h):
    from csr_tpu import CSR

    c = h.csr
    return CSR(c.nrows, c.ncols, c.nnz, c.rowptrs, c.colinds, c.values, _cast=False)


def release_handle(h, drop_cache: bool = False):
    """Drop the handle's device references.  The micro-block layout cache
    lives on the CSR object itself (see :func:`_cached_layout`) and is
    collected with the matrix — releasing a handle keeps repeated
    high-level calls cheap, unlike MKL handles whose buffers must be freed
    eagerly (reference: csr/kernels/mkl/handle.py:144-148).

    Pass ``drop_cache=True`` to also clear the matrix's cached layout
    (~1.5x nnz bytes of HBM) for explicit memory reclamation in
    memory-constrained multi-matrix workflows."""
    trace("release_handle", kernel="pallas", nnz=h.csr.nnz)
    h._layout = None
    h._layout_t = None
    h._xla_handle = None
    h._dense = None
    h._dense64 = None
    if drop_cache:
        for attr in ("_mb_layout_cache", "_mb_layout_t_cache",
                     "_mb_large_cache", "_mb_large_t_cache"):
            try:
                setattr(h.csr, attr, None)
            except AttributeError:
                pass


def order_columns(h):
    h.csr.sort_rows()
    h._layout = None
    h._layout_t = None


def _pallas_viable(csr, v_dtype, transpose: bool = False) -> bool:
    if csr.nnz == 0:
        return False
    if jnp.dtype(v_dtype) == jnp.float64 or (
        csr.values is not None and csr.values.dtype == jnp.float64
    ):
        # f64 is emulated on TPU; use the XLA path for full-precision work
        return False
    out_rows, in_cols = (csr.ncols, csr.nrows) if transpose else (
        csr.nrows, csr.ncols
    )
    rb = -(-out_rows // microblock.LANE)
    cb = -(-in_cols // microblock.LANE)
    return rb <= _VMEM_WINDOWS and cb <= _VMEM_WINDOWS


def _host_arrays(csr):
    host = getattr(csr, "_host", None)
    if host is not None:
        return host
    return (
        np.asarray(csr.rowptrs),
        np.asarray(csr.colinds),
        None if csr.values is None else np.asarray(csr.values),
    )


def _cached_large(csr, transpose: bool):
    """Chunk/panel layouts for matrices whose operand or output exceeds
    the VMEM windows budget, cached on the CSR (identity-keyed like
    :func:`_cached_layout`).  Keeps any-shape SpMV on the micro-block
    kernel instead of the ~1000x-slower XLA gather path
    (reference anchor: any-shape flat loop,
    csr/kernels/numba/__init__.py:55-67)."""
    attr = "_mb_large_t_cache" if transpose else "_mb_large_cache"
    cached = getattr(csr, attr, None)
    if (
        cached is not None
        and cached[0] is csr.rowptrs
        and cached[1] is csr.colinds
        and cached[2] is csr.values
    ):
        return cached[3]
    rp, cis, vals = _host_arrays(csr)
    nrows, ncols = csr.nrows, csr.ncols
    if transpose:
        from csr_tpu import native

        vals32 = None if vals is None else np.asarray(vals, np.float32)
        rp, cis, vals = native.transpose_host(nrows, ncols, rp, cis, vals32)
        nrows, ncols = ncols, nrows
    chunks = _spmv_op.build_large_layouts(
        nrows, ncols, rp, cis, vals, max_windows=_VMEM_WINDOWS
    )
    trace(
        "layout-build-large",
        nnz=csr.nnz,
        chunks=len(chunks),
        panels=sum(len(p) for _, p in chunks),
        transpose=transpose,
    )
    try:
        setattr(csr, attr, (csr.rowptrs, csr.colinds, csr.values, chunks))
    except AttributeError:
        pass
    return chunks


def mult_vec(h, v):
    """SpMV via the micro-block Pallas kernel.  f64 falls back to the XLA
    path; matrices whose operand/output exceed VMEM run the chunk/panel
    micro-block path (no performance cliff at large shapes)."""
    out_dtype = _xla._result_dtype(
        h.csr._required_values().dtype, jnp.asarray(v).dtype
    )
    if not _pallas_viable(h.csr, v.dtype):
        if jnp.dtype(out_dtype) == jnp.float64 and h.csr.nnz > 0:
            # f64 fast path: the densified emulated-f64 matvec measures
            # 1.5x the segment-sum fallback at d=0.01; breakeven ~6e-3
            # (docs/perf.md round 5)
            if _dense_affordable(h.csr, jnp.float64):
                return jnp.dot(h.dense64, jnp.asarray(v).astype(jnp.float64))
            return _xla.mult_vec(h.xla_handle, v)
        if h.csr.nnz == 0:
            return _xla.mult_vec(h.xla_handle, v)
        chunks = _cached_large(h.csr, transpose=False)
        out = _spmv_op.spmv_large(
            chunks, h.csr.ncols, v, interpret=_interpret_mode()
        )
        return out.astype(out_dtype)
    out = _spmv_op.spmv(h.layout, v, interpret=_interpret_mode())
    return out.astype(out_dtype)


def mult_vec_t(h, v):
    """Transpose SpMV ``A^T @ v`` on the micro-block kernel, via a cached
    layout of the transpose (no dense scatter-add over the column space;
    the reference reaches A^T structurally the same way,
    reference: csr/kernels/numba/multiply.py:41-57)."""
    out_dtype = _xla._result_dtype(
        h.csr._required_values().dtype, jnp.asarray(v).dtype
    )
    if not _pallas_viable(h.csr, v.dtype, transpose=True):
        if jnp.dtype(out_dtype) == jnp.float64 and h.csr.nnz > 0:
            if _dense_affordable(h.csr, jnp.float64):
                # v @ A = A^T v without materializing the transpose
                return jnp.dot(jnp.asarray(v).astype(jnp.float64), h.dense64)
            return _xla.mult_vec_t(h.xla_handle, v)
        if h.csr.nnz == 0:
            return _xla.mult_vec_t(h.xla_handle, v)
        chunks = _cached_large(h.csr, transpose=True)
        out = _spmv_op.spmv_large(
            chunks, h.csr.nrows, v, interpret=_interpret_mode()
        )
        return out.astype(out_dtype)
    out = _spmv_op.spmv(h.layout_t, v, interpret=_interpret_mode())
    return out.astype(out_dtype)


def _spmm_viable(csr, n_out_rows: int) -> bool:
    """Can the micro-block SpMM hold its working set in VMEM?

    The kernel keeps the B column-panel and the output column-panel
    resident, and the pipeline double-buffers every streamed block, so the
    true footprint is ~2x the panel bytes plus the micro-row blocks and
    the i32 unpack scratch (measured OOM at 18 MB vs the 16 MB scoped
    limit for 8192^2 @ 128-wide panels)."""
    if csr.nnz == 0:
        return False
    cb = -(-csr.ncols // microblock.LANE)
    rb = -(-n_out_rows // microblock.LANE)
    lane2 = microblock.LANE * microblock.LANE
    panels = 2 * (cb + rb) * lane2 * 4  # double-buffered B + out panels
    blocks = 2 * microblock.MR_BLOCK * microblock.LANE * 6  # vals + meta
    scratch = microblock.MR_BLOCK * microblock.LANE * 4  # i32 unpack
    return panels + blocks + scratch < 14 * 2**20


# Densify-and-matmul threshold.  Measured on v5e (docs/perf.md): the
# dense f32 HIGHEST matmul runs ~8.25 T elem-col/s, and the round-5
# transposed micro-block SpMM runs 62 Gnnz-col/s (it was ~10 when this
# threshold was 2e-3), so dense wins above density ~62/8250 = 7.5e-3
# whenever the densified matrix fits the memory budget; the measured
# flagship point agrees (d=0.02: dense 0.52 ms vs kernel 1.39 ms).
_DENSIFY_MAX_ELEMS = 2**27  # 512 MB f32
_DENSIFY_MIN_DENSITY = 7e-3
_DENSIFY_MIN_DENSITY_F64 = 6e-3  # measured breakeven vs the XLA f64 paths


def _dense_affordable(csr, dtype=jnp.float32) -> bool:
    elems = csr.nrows * csr.ncols
    budget = _DENSIFY_MAX_ELEMS
    if jnp.dtype(dtype) == jnp.float64:
        budget //= 2  # same byte budget at 8 B/elem
    if elems == 0 or elems > budget:
        return False
    density = csr.nnz / elems
    if jnp.dtype(dtype) == jnp.float64:
        # f64 breakeven is HIGHER than f32's: emulated f64 is
        # compute-bound even in dense form (measured on v5e: dense f64
        # matvec streams at only 14 GB/s), so the dense route beats the
        # XLA sparse fallbacks (~2x) only above ~5-7e-3 density
        # (docs/perf.md round 5)
        return density >= _DENSIFY_MIN_DENSITY_F64
    return density >= _DENSIFY_MIN_DENSITY


def mult_dense(h, B):
    """SpMM ``A @ B`` with dense B: densified MXU matmul at practical
    densities, micro-block kernel for big sparse matrices, XLA fallback."""
    B = jnp.asarray(B)
    out_dtype = _xla._result_dtype(h.csr._required_values().dtype, B.dtype)
    if jnp.dtype(out_dtype) == jnp.float64:
        if h.csr.nnz > 0 and _dense_affordable(h.csr, jnp.float64):
            # f64 fast path: emulated dense f64 matmul, ~2x the XLA
            # scatter-add formulation above ~6e-3 density (docs/perf.md)
            return jnp.dot(h.dense64, B.astype(jnp.float64))
        return _xla.mult_dense(h.xla_handle, B)
    if _dense_affordable(h.csr):
        out = jax.numpy.dot(
            h.dense, B.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.astype(out_dtype)
    if not _spmm_viable(h.csr, h.csr.nrows):
        return _xla.mult_dense(h.xla_handle, B)
    out = _spmm_op.spmm(h.layout, B, interpret=_interpret_mode())
    return out.astype(out_dtype)


def _spgemm(a_h, b_h, transpose: bool):
    """SpGEMM by densification: densify B (or B^T); contract with A on
    the MXU (dense x dense when A densifies affordably, micro-block SpMM
    otherwise); compact the product back to CSR.  On TPU this replaces
    SMMP-style symbolic/numeric passes (reference:
    csr/kernels/numba/multiply.py:60-129): at SpGEMM-practical densities
    the MXU's dense throughput beats any gather/scatter formulation.

    When the dense forms of B or C exceed the
    :data:`csr_tpu.ops.spgemm.max_dense_elems` budget, the product runs
    through the bounded-memory ESC path instead — the capacity contract
    the reference enforces via ``max_nnz`` sharding
    (reference: csr/csr.py:558-567)."""
    from csr_tpu.ops import spgemm as esc

    a, b = a_h.csr, b_h.csr
    b_vals = b._required_values()
    out_dtype = _xla._result_dtype(a._required_values().dtype, b_vals.dtype)
    n_out = b.nrows if transpose else b.ncols
    if not esc.dense_fits(a.nrows, b.nrows, b.ncols, n_out):
        mul = esc.esc_mult_abt if transpose else esc.esc_mult_ab
        return to_handle(mul(a, b, out_dtype))
    bx = b_h.xla_handle
    # f64 products keep f64 through the dense intermediate (the XLA
    # backend does the same; the reference normalizes to f64 for MKL,
    # reference: csr/kernels/mkl/handle.py:69)
    b_dense = _xla._densify(
        b_vals, b.colinds, bx.row_ids, b.nrows, b.ncols,
        jnp.float64 if out_dtype == jnp.float64 else jnp.float32,
    )
    if transpose:
        b_dense = b_dense.T
    n_out_cols = b_dense.shape[1]
    if out_dtype == jnp.float64 and _dense_affordable(a, jnp.float64):
        # f64 fast path: emulated-f64 dense matmul (~1.5 TFLOP/s on v5e),
        # ~2x the scatter-add formulation above ~6e-3 density
        c_dense = jnp.dot(a_h.dense64, b_dense)
    elif out_dtype != jnp.float64 and _dense_affordable(a):
        c_dense = jax.numpy.dot(
            a_h.dense, b_dense, precision=jax.lax.Precision.HIGHEST
        ).astype(out_dtype)
    elif out_dtype == jnp.float64 or not _spmm_viable(a, a.nrows):
        c_dense = _xla._spgemm_dense(
            a._required_values(), a.colinds, a_h.xla_handle.row_ids,
            b_dense, a.nrows, n_out_cols, out_dtype,
        )
    else:
        c_dense = _spmm_op.spmm(a_h.layout, b_dense, interpret=_interpret_mode())
        c_dense = c_dense.astype(out_dtype)
    return to_handle(_xla.dense_to_csr(c_dense))


def mult_ab(a_h, b_h):
    return _spgemm(a_h, b_h, transpose=False)


def mult_abt(a_h, b_h):
    return _spgemm(a_h, b_h, transpose=True)
