"""
Pallas TPU SpMM kernel: sparse (micro-block) x dense-tall.

``C = A @ B`` with A in micro-block layout and B dense ``(k, n)``.

Where SpMV uses ``dynamic_gather`` + lane cumsum, SpMM routes everything
through the MXU: for each micro-row (128 entries in one 128x128
row/column window) we build two selection matrices from the layout and
contract them on the systolic array:

* ``S[c, e] = vals[e] * (lo[e] == c)`` — scaled column-selection one-hot.
  ``dot(S, B_win)`` contracted over ``c`` gathers and scales the needed
  B rows: the MXU does the "gather".
* ``R[e, r] = (eposprev[r] <= e < epos[r])`` — row-membership mask.
  ``dot(R, .)`` contracted over ``e`` performs the segment reduction: the
  MXU does the "scatter-add".

Both one-hots are built with broadcast compares oriented so no in-kernel
transposes are needed (the varying operand always varies along the lane
axis).  Cost: ~4 MXU FLOPs per stored entry per output column plus ~100
vector instructions per 128 entries — MXU-bound for wide B, which is the
right place to be on TPU.

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

#: micro-rows traced per loop body.  The per-micro-row chain (one-hot
#: build -> 2 MXU matmuls -> output RMW) is serial; unrolling lets
#: Mosaic overlap iteration u+1's VPU one-hot build with iteration u's
#: matmuls.  Measured on v5e at the 4096^2 d=0.02 flagship (in-process
#: control, scratch/spmm_unroll.py): 5.70 ms serial -> 4.55/3.94/3.66/
#: 3.47/3.40/3.37 ms at u=2/4/8/16/32/64 — 32 takes the 1.67x with
#: bounded trace size (full MR_BLOCK unroll would trace 4096 matmuls).
#: 32 also equals microblock.ACC_GROUP, so each unrolled body covers
#: exactly one stripe-padding group (uniform rb): partials accumulate in
#: registers and the body issues ONE output read-modify-write instead of
#: 32 serially-dependent ones — a further -9% (3.41 -> 3.09 ms, 27.8
#: Gnnz-col/s; scratch/spmm_group.py).  The partial-sum tree is chunked
#: 8 at a time: 32 live (128,128) f32 partials overflow the 16 MB
#: scoped-VMEM stack (measured OOM by 984 KB).
_UNROLL = 32
assert _UNROLL == ACC_GROUP  # one body == one uniform-rb stripe group


def _spmm_kernel(rbcb_ref, vals_ref, meta_ref, b_ref, out_ref, meta32_ref, *, wb):
    i = pl.program_id(1)  # micro-row block step (minor: B/out tiles stay put)
    win = wb * LANE  # columns per micro-row window (128 or 256)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Unpack the u16 metadata block to i32 scratch once per step: 16-bit
    # tiles cannot be dynamically sliced per micro-row on TPU (sublane
    # alignment is unprovable), i32 rows can.
    meta32_ref[:] = meta_ref[:].astype(jnp.int32)

    c_iota = jax.lax.broadcasted_iota(jnp.int32, (win, LANE), 0)
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    lo_mask, e_shift = (127, 7) if wb == 1 else (255, 8)

    def one(m):
        cb = rbcb_ref[m] & 0xFFFF
        vals = vals_ref[pl.ds(m, 1), :]  # (1, 128) entries along lanes
        meta = meta32_ref[pl.ds(m, 1), :]
        lo = meta & lo_mask
        epos = meta >> e_shift

        # S[c, e]: scaled one-hot of each entry's window column
        lo_b = jnp.broadcast_to(lo, (win, LANE))
        vals_b = jnp.broadcast_to(vals, (win, LANE))
        S = jnp.where(c_iota == lo_b, vals_b, 0.0)

        # R[e, r]: row membership from boundary prefix counts
        eposprev = pltpu.roll(epos, 1, axis=1)
        eposprev = jnp.where(lane == 0, 0, eposprev)
        ep_b = jnp.broadcast_to(epos, (LANE, LANE))
        epp_b = jnp.broadcast_to(eposprev, (LANE, LANE))
        R = jnp.where((e_iota >= epp_b) & (e_iota < ep_b), 1.0, 0.0)

        b_win = b_ref[pl.ds(cb * win, win), :]
        # gathered[e, :] = vals[e] * B[cb*128 + lo[e], :]  (MXU).  HIGHEST
        # precision: the MXU multiplies in bf16 by default, which is not
        # accurate enough for value data (S carries the values).
        gathered = jax.lax.dot_general(
            S, b_win, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        # c_win[r, :] = sum of gathered over entries of row r  (MXU);
        # R is 0/1 (bf16-exact) but gathered is value data
        c_win = jax.lax.dot_general(
            R, gathered, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return c_win

    def body(g, _):
        base = pl.multiple_of(g * _UNROLL, _UNROLL)
        # the layout pads stripes to ACC_GROUP micro-rows, so this whole
        # group shares one rb window: sum partials in registers
        # (8-chunked trees — see _UNROLL note) and issue one RMW
        acc = None
        for c0 in range(0, _UNROLL, 8):
            parts = [one(base + c0 + k) for k in range(8)]
            while len(parts) > 1:
                parts = [a + b for a, b in zip(parts[::2], parts[1::2])]
            acc = parts[0] if acc is None else acc + parts[0]
        rb = rbcb_ref[base] >> 16
        out_ref[pl.ds(rb * LANE, LANE), :] += acc
        return 0

    jax.lax.fori_loop(0, MR_BLOCK // _UNROLL, body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("m_pad", "rb_count", "k_pad", "n_pad", "interpret", "wb"),
)
def _spmm_call(
    vals, meta, rbcb, b_pad,
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
            pl.BlockSpec((k_pad, N_TILE), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((rb_count * LANE, N_TILE), lambda j, i: (0, j)),
        scratch_shapes=[pltpu.VMEM((MR_BLOCK, LANE), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_spmm_kernel, wb=wb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rb_count * LANE, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * LANE * LANE * n_pad,
            bytes_accessed=n_n * m_pad * LANE * 6 + k_pad * n_pad * 4
            + rb_count * LANE * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rbcb, vals, meta, b_pad)


def spmm(layout: MicroBlockLayout, b, *, interpret: bool = False):
    """``A @ B`` with dense ``B`` of shape ``(A.ncols, n)``; returns the
    dense float32 product of shape ``(A.nrows, n)``."""
    k, n = b.shape
    assert k == layout.ncols
    cb_count = max(layout.cb_count, 1)
    rb_count = max(layout.rb_count, 1)
    k_pad = cb_count * LANE
    n_pad = max(-(-n // N_TILE) * N_TILE, N_TILE)
    b_pad = jnp.zeros((k_pad, n_pad), jnp.float32)
    b_pad = b_pad.at[:k, :n].set(b.astype(jnp.float32))
    out = _spmm_call(
        layout.vals, layout.meta, layout.rbcb, b_pad,
        layout.vals.shape[0], rb_count, k_pad, n_pad, interpret,
        wb=layout.window // LANE,
    )
    return out[: layout.nrows, :n]
