"""
Pallas TPU SpMV kernel over the micro-block layout.

``y = A @ x`` with A in :class:`csr_tpu.ops.microblock.MicroBlockLayout`.

Per grid step the kernel streams ``MR_BLOCK`` micro-rows (each 128 entries)
from HBM through VMEM and, for every vector register of 8 micro-rows:

1. builds the gather operand from 8 dynamic 128-lane slices of the dense
   operand ``x`` (one per micro-row's column window);
2. gathers entry values with a single ``dynamic_gather``
   (``jnp.take_along_axis`` on one vreg);
3. multiplies by the stored values;
4. computes per-row sums with a log-step lane cumsum and one gather at the
   precomputed row-boundary prefix counts (``epos``);
5. accumulates the resulting dense 128-row windows into the output, which
   lives in VMEM for the whole kernel (constant output block).

The dense operand and output stay resident in VMEM, so HBM traffic is one
read of the micro-block arrays (12 B/entry in the int32 layout) — this is
what lets the kernel approach the HBM roofline where gather-based XLA
SpMV is ~1000x off it.

Correctness replaces reference csr/kernels/numba/__init__.py:55-67 (flat
nnz loop) and csr/kernels/mkl (mkl_sparse_d_mv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .microblock import LANE, MR_BLOCK, MicroBlockLayout

_VREGS = MR_BLOCK // 8  # vector registers of micro-rows per grid step


def _lane_cumsum(x, lane):
    """Inclusive cumsum along the 128-lane axis via log-step shifts.

    jnp.cumsum has no Mosaic lowering; 7 roll+add steps do the same work in
    ~21 vector instructions per vreg.
    """
    for d in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(x, d, axis=1)
        x = x + jnp.where(lane >= d, sh, 0.0)
    return x


def _spmv_kernel(rbcb_ref, vals_ref, lo_ref, epos_ref, x_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)

    def body(i, _):
        base = pl.multiple_of(i * 8, 8)
        vals = vals_ref[pl.ds(base, 8), :]
        lo = lo_ref[pl.ds(base, 8), :]
        epos = epos_ref[pl.ds(base, 8), :]

        # gather operand: one 128-col window of x per micro-row
        rows = []
        for s in range(8):
            cb = rbcb_ref[base + s] & 0xFFFF
            rows.append(x_ref[pl.ds(cb, 1), :])
        operand = jnp.concatenate(rows, axis=0)

        g = jnp.take_along_axis(operand, lo, axis=1)
        p = vals * g

        # per-row sums: cumsum + boundary-prefix gather
        c = _lane_cumsum(p, lane)
        H = jnp.take_along_axis(c, jnp.maximum(epos - 1, 0), axis=1)
        H = jnp.where(epos > 0, H, 0.0)
        Hs = pltpu.roll(H, 1, axis=1)
        Hs = jnp.where(lane == 0, 0.0, Hs)
        rowsums = H - Hs

        # accumulate each micro-row's dense 128-row window into the output
        for s in range(8):
            rb = rbcb_ref[base + s] >> 16
            out_ref[pl.ds(rb, 1), :] += rowsums[s : s + 1, :]
        return 0

    jax.lax.fori_loop(0, _VREGS, body, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("m_pad", "rb_count", "cb_count", "interpret")
)
def _spmv_call(
    vals, lo, epos, rbcb, x_pad, m_pad: int, rb_count: int, cb_count: int,
    interpret: bool,
):
    n_steps = m_pad // MR_BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((MR_BLOCK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((MR_BLOCK, LANE), lambda i: (i, 0)),
            pl.BlockSpec((MR_BLOCK, LANE), lambda i: (i, 0)),
            pl.BlockSpec((MR_BLOCK, LANE), lambda i: (i, 0)),
            # x stays whole in VMEM across all steps
            pl.BlockSpec((cb_count, LANE), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb_count, LANE), lambda i: (0, 0)),
    )
    flops = 2 * m_pad * LANE
    return pl.pallas_call(
        _spmv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rb_count, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m_pad * LANE * 12 + cb_count * LANE * 4 + rb_count * LANE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rbcb, vals, lo, epos, x_pad)


def spmv(layout: MicroBlockLayout, x, *, interpret: bool = False):
    """Compute ``A @ x`` for a micro-block matrix.  Returns float32."""
    cb_count = max(layout.cb_count, 1)
    rb_count = max(layout.rb_count, 1)
    x = x.astype(jnp.float32)
    x_pad = jnp.zeros((cb_count * LANE,), jnp.float32).at[: layout.ncols].set(x)
    x_pad = x_pad.reshape(cb_count, LANE)
    m_pad = layout.vals.shape[0]
    y_mat = _spmv_call(
        layout.vals, layout.lo, layout.epos, layout.rbcb, x_pad,
        m_pad, rb_count, cb_count, interpret,
    )
    return y_mat.reshape(-1)[: layout.nrows]
