"""
Pallas TPU SpMM kernel: sparse (micro-block) x dense-tall.

``C = A @ B`` with A in micro-block layout and B dense ``(k, n)``.

Transposed formulation (round 5): B and the output live TRANSPOSED in
VMEM so both random accesses ride the lane axis — the one axis
``dynamic_gather`` supports at 128 width:

* ``g_t[n, e] = B_t[n, cb*128 + lo[e]]`` — ONE lane ``take_along_axis``
  replaces the one-hot "MXU gather" matmul of the earlier formulation;
* ``cum_t = (g_t * vals) @ U`` with U the strict upper-triangular ones
  matrix — ONE MXU matmul computes exclusive prefix sums over the
  micro-row's (row-sorted) entries for all N columns at once;
* ``H_t[n, r] = cum_t[n, epos[r]]`` — one more lane gather at the
  precomputed row-boundary prefix counts (``epos``, in [0,127] by the
  SLOT_CAP=127 layout bound) yields CUMULATIVE per-row sums, exactly the
  SpMV kernel's stage-3 scheme (csr_tpu/ops/spmv.py) vectorized over B
  columns.  The per-row difference commutes with accumulation and is
  deferred to ONE masked lane-roll pass at the last grid step.

The per-micro-row work is 1 matmul + 2 lane gathers + 2 broadcasts —
half the MXU flops and a fraction of the VPU work of the previous
one-hot/membership-matrix formulation (which built (win,128) and
(128,128) select masks per micro-row).  Output accumulation issues one
read-modify-write per ACC_GROUP-aligned micro-row group (the layout
pads stripes so aligned groups share one rb window — the same invariant
SpMV's stage 4 uses), with partials summed in 8-chunked register trees
(32 live (128,128) f32 partials overflow the 16 MB scoped-VMEM stack;
measured OOM by 984 KB).

Measured on v5e at the 4096^2 d=0.02 flagship, B 4096x256
(docs/perf.md round 5, in-process controls):
serial one-hot body 5.70 ms -> 32x unroll 3.41 -> grouped RMW 3.08 ->
transposed 1-matmul formulation **1.39 ms = 61.9 Gnnz-col/s** (4.1x
total).  Accuracy: the cumsum-difference reduction carries the same
accumulation error model as the SpMV kernel (~2e-6 relative at the
flagship vs 4e-7 for the membership-matrix form; the suite's 5e-4 SpMM
tolerance covers both with large headroom).

Replaces the dense-operand half of the reference's SpGEMM paths
(reference: csr/kernels/numba/multiply.py:103-129 numeric pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .microblock import ACC_GROUP, LANE, MR_BLOCK, MicroBlockLayout

N_TILE = 128

#: micro-rows traced per loop body.  Unrolling lets Mosaic overlap one
#: micro-row's VPU gathers with another's MXU matmul; 32 equals
#: microblock.ACC_GROUP, so each body covers exactly one stripe-padding
#: group (uniform rb) and issues a single grouped RMW (module docstring).
_UNROLL = 32
assert _UNROLL == ACC_GROUP  # one body == one uniform-rb stripe group


def _spmm_kernel(rbcb_ref, vals_ref, meta_ref, bt_ref, out_ref, meta32_ref,
                 *, wb):
    i = pl.program_id(1)  # micro-row block step (minor: B/out tiles stay put)
    win = wb * LANE  # columns per micro-row window (128 or 256)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Unpack the u16 metadata block to i32 scratch once per step: 16-bit
    # tiles cannot be dynamically sliced per micro-row on TPU (sublane
    # alignment is unprovable), i32 rows can.
    meta32_ref[:] = meta_ref[:].astype(jnp.int32)

    li = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    U = jnp.where(li < lj, 1.0, 0.0)
    lo_mask, e_shift = (127, 7) if wb == 1 else (255, 8)

    def one(mr):
        cb = rbcb_ref[mr] & 0xFFFF
        vals = vals_ref[pl.ds(mr, 1), :]
        meta = meta32_ref[pl.ds(mr, 1), :]
        lo = meta & lo_mask
        epos = (meta >> e_shift) & 127

        # lane gather of each entry's B column (transposed layout); the
        # 256-wide double window picks between two 128-lane gathers with
        # one select, exactly as the SpMV kernel's stage 2
        if wb == 1:
            bt_win = bt_ref[:, pl.ds(cb * LANE, LANE)]
            g_t = jnp.take_along_axis(
                bt_win, jnp.broadcast_to(lo, (N_TILE, LANE)), axis=1
            )
        else:
            lo7 = jnp.broadcast_to(lo & 127, (N_TILE, LANE))
            g0 = jnp.take_along_axis(
                bt_ref[:, pl.ds(cb * win, LANE)], lo7, axis=1
            )
            g1 = jnp.take_along_axis(
                bt_ref[:, pl.ds(cb * win + LANE, LANE)], lo7, axis=1
            )
            g_t = jnp.where(jnp.broadcast_to(lo, (N_TILE, LANE)) < 128, g0, g1)
        p_t = g_t * jnp.broadcast_to(vals, (N_TILE, LANE))

        # exclusive prefix over the micro-row's entries (MXU), then the
        # boundary gather at epos -> CUMULATIVE per-row sums
        cum_t = jax.lax.dot_general(
            p_t, U, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return jnp.take_along_axis(
            cum_t, jnp.broadcast_to(epos, (N_TILE, LANE)), axis=1
        )

    def body(g, _):
        base = pl.multiple_of(g * _UNROLL, _UNROLL)
        # one stripe group: sum partials in registers (8-chunked trees),
        # one RMW into the group's rb window
        acc = None
        for c0 in range(0, _UNROLL, 8):
            parts = [one(base + c0 + k) for k in range(8)]
            while len(parts) > 1:
                parts = [a + b for a, b in zip(parts[::2], parts[1::2])]
            acc = parts[0] if acc is None else acc + parts[0]
        rb = rbcb_ref[base] >> 16
        out_ref[:, pl.ds(rb * LANE, LANE)] += acc
        return 0

    jax.lax.fori_loop(0, MR_BLOCK // _UNROLL, body, 0, unroll=False)

    # final pass: one masked lane-roll difference turns the accumulated
    # cumulative sums into per-row results (window boundary every 128
    # lanes)
    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        acc_c = out_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, acc_c.shape, 1)
        sh = pltpu.roll(acc_c, 1, axis=1)
        out_ref[:] = acc_c - jnp.where(lane % LANE == 0, 0.0, sh)


@functools.partial(
    jax.jit,
    static_argnames=("m_pad", "rb_count", "k_pad", "n_pad", "interpret", "wb"),
)
def _spmm_call(
    vals, meta, rbcb, bt_pad,
    m_pad: int, rb_count: int, k_pad: int, n_pad: int, interpret: bool,
    wb: int = 1,
):
    n_mr = m_pad // MR_BLOCK
    n_n = n_pad // N_TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_n, n_mr),
        in_specs=[
            pl.BlockSpec((MR_BLOCK,), lambda j, i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((MR_BLOCK, LANE), lambda j, i: (i, 0)),
            pl.BlockSpec((MR_BLOCK, LANE), lambda j, i: (i, 0)),
            pl.BlockSpec((N_TILE, k_pad), lambda j, i: (j, 0)),
        ],
        out_specs=pl.BlockSpec((N_TILE, rb_count * LANE), lambda j, i: (j, 0)),
        scratch_shapes=[pltpu.VMEM((MR_BLOCK, LANE), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_spmm_kernel, wb=wb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, rb_count * LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * LANE * LANE * n_pad // N_TILE,
            bytes_accessed=n_n * m_pad * LANE * 6 + k_pad * n_pad * 4
            + rb_count * LANE * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rbcb, vals, meta, bt_pad)


def spmm(layout: MicroBlockLayout, b, *, interpret: bool = False):
    """``A @ B`` with dense ``B`` of shape ``(A.ncols, n)``; returns the
    dense float32 product of shape ``(A.nrows, n)``."""
    k, n = b.shape
    assert k == layout.ncols
    cb_count = max(layout.cb_count, 1)
    rb_count = max(layout.rb_count, 1)
    k_pad = cb_count * LANE
    n_pad = max(-(-n // N_TILE) * N_TILE, N_TILE)
    # B rides transposed so the kernel's gathers stay on the lane axis;
    # the (cheap, bandwidth-bound) transposes happen in XLA outside
    bt_pad = jnp.zeros((n_pad, k_pad), jnp.float32)
    bt_pad = bt_pad.at[:n, :k].set(b.astype(jnp.float32).T)
    out_t = _spmm_call(
        layout.vals, layout.meta, layout.rbcb, bt_pad,
        layout.vals.shape[0], rb_count, k_pad, n_pad, interpret,
        wb=layout.window // LANE,
    )
    return out_t.T[: layout.nrows, :n]
