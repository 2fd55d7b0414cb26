"""
Pallas TPU SpMV kernel over the micro-block layout.

``y = A @ x`` with A in :class:`csr_tpu.ops.microblock.MicroBlockLayout`.

Per grid step the kernel streams ``MR_BLOCK`` micro-rows (each 128
entries) from HBM through VMEM and computes in four stages, all but two
of which are full-block vector/matrix ops (no per-element work):

1. **operand assembly** (per-vreg loop): each micro-row's 128-column
   window of ``x`` is copied into a scratch block — 8 dynamic slices per
   vector register, indexed by the ``cb`` scalars streamed through SMEM;
2. **gather**: one full-block ``dynamic_gather``
   (``take_along_axis`` along lanes) picks each entry's operand value,
   then multiplies by the stored values;
3. **cumulative row sums**: an *MXU* prefix-sum — ``p @ U`` with U the
   constant STRICT upper-triangular ones matrix (exclusive prefix) —
   followed by ONE unclamped gather at the precomputed row-boundary
   prefix counts (``epos``), giving ``H[mr, r]`` = sum of the micro-row's
   entries in window-rows ``<= r``.  Micro-rows hold at most
   ``SLOT_CAP = 127`` entries, so ``epos`` is in [0, 127]: the unpack's
   ``& 127`` makes the gather index provably lane-bounded (no clamp, no
   epos==0 select — the boundary stage is the kernel's only exposed
   compute, docs/perf.md round-4).  The matmul
   formulation matters: lane-wise shift cumsums cost ~11 ms at 10M nnz on
   v5e because lane rotates are expensive; the MXU does the same
   reduction almost for free.  The product runs as a manual two-pass
   bf16 split (``p_hi @ U + p_lo @ U``, f32 accumulation; U is exact in
   bf16) — ~16-bit mantissa coverage of ``p``, worst-case per-row error
   2^-17 x the row's L1 mass, measured 3.4e-6 relative at the flagship.
   Two native-bf16 passes beat both ``Precision.HIGHEST`` (-8%) and,
   surprisingly, single-pass DEFAULT (which pays an implicit f32->bf16
   relayout);
4. **output accumulation**: the CUMULATIVE ``H`` is accumulated directly
   — ``ACC_GROUP`` micro-rows (one stripe-padding group, uniform row
   window) per read-modify-write, straight off the value with no scratch
   round-trip.  The per-row difference ``H[r] - H[r-1]`` commutes with
   all this summation, so it is **deferred to one lane-roll pass over the
   output at the last grid step** instead of a per-step roll chain
   (lane rolls are expensive; this was 25% of the old step cost).

Measured on TPU v5e at 10.7M nnz (d=0.01): 0.249 ms/iter -> 43.1 Gnnz/s =
407 GB/s, ~600x over XLA's native gather+segment_sum SpMV (155 ms).
Established by ablation (docs/perf.md): DMA overlaps completely,
u16-packed metadata (6 B/slot) halves stream bytes, MR_BLOCK=2048
amortizes per-step fixed costs (4096 exceeds the 16 MB scoped-VMEM
limit), ACC_GROUP=32 with value-direct accumulation removes 3/4 of the
output RMWs, the deferred difference removes the per-step roll, and
pair-mode layouts (aligned micro-row runs sharing a column window)
halve the scalar-core addressing that dominates the build loop.

Correctness replaces reference csr/kernels/numba/__init__.py:55-67 (flat
nnz loop) and csr/kernels/mkl (mkl_sparse_d_mv).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .microblock import (
    ACC_GROUP, LANE, MR_BLOCK, MicroBlockLayout, build_microblocks_host,
)

#: independent sub-blocks per grid step.  The stages of one sub-block
#: form a serial chain (build -> gather -> matmul -> boundary); tracing
#: two chains gives Mosaic's scheduler freedom to overlap sub-block 1's
#: VPU build loop with sub-block 0's MXU matmul: measured -6.3%/step,
#: bit-exact (quarters are slightly worse).
_NSUB = 2
_SUB = MR_BLOCK // _NSUB


def _spmv_kernel(rbcb_ref, vals_ref, meta_ref, x_ref, out_ref, *scratch,
                 wb, pair=1):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # STRICT upper triangle: the matmul computes an EXCLUSIVE prefix sum,
    # so the boundary stage is one unclamped gather at epos (micro-rows
    # hold <= SLOT_CAP = 127 entries, so epos is in [0, 127] and the
    # `& 127` in the unpack makes the gather index provably lane-bounded
    # -- no clamp, no epos==0 select; measured -2.5%/step, docs/perf.md)
    li = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    U = jnp.where(li < lj, 1.0, 0.0)

    Hs = []
    for s_ in range(_NSUB):
        off = s_ * _SUB

        # stage 1: assemble each micro-row's x window into scratch.  With
        # the 256-wide double window (wb=2) each micro-row gets two operand
        # vregs, staged in two scratch blocks (lane count per block caps at
        # 128, the dynamic_gather limit).  This loop is SCALAR-CORE bound
        # (one operand address per micro-row); pair-mode layouts guarantee
        # aligned ``pair``-length micro-row runs share one window, so one
        # address (and one slice, duplicated into ``pair`` sublanes) serves
        # the whole run — measured -21%/step at pair=2 (docs/perf.md).
        def build(i, _, off=off):
            base = pl.multiple_of(off + i * 8, 8)
            rows = [[] for _ in range(wb)]
            for s in range(8 // pair):
                cb = rbcb_ref[base + pair * s] & 0xFFFF
                # wb separate single-row slices: a contiguous (wb, 128)
                # slice plus a static sublane split measures 3.4x slower
                # (the split forces per-vreg relayouts)
                for w in range(wb):
                    rows[w].extend([x_ref[pl.ds(cb * wb + w, 1), :]] * pair)
            for w in range(wb):
                scratch[w][pl.ds(base, 8), :] = jnp.concatenate(
                    rows[w], axis=0
                )
            return 0

        # Full unroll: Mosaic supports only unroll=1 or =trip-count for
        # kernel loops, and unrolling removes the scalar loop-carried
        # dependency -- measured -22% per step (docs/perf.md).
        jax.lax.fori_loop(0, _SUB // 8, build, 0, unroll=_SUB // 8)

        # unpack the u16 metadata stream (6 B/slot total with vals); the
        # `& 127` on epos is the provable lane bound for the boundary
        # gather (epos <= SLOT_CAP by construction)
        meta = meta_ref[off : off + _SUB, :].astype(jnp.int32)
        if wb == 1:
            lo = meta & 127
            epos = (meta >> 7) & 127
        else:
            lo = meta & 255
            epos = (meta >> 8) & 127

        # stage 2: full-block gather + scale
        if wb == 1:
            g = jnp.take_along_axis(scratch[0][off : off + _SUB, :], lo,
                                    axis=1)
        else:
            lo7 = lo & 127
            g0 = jnp.take_along_axis(scratch[0][off : off + _SUB, :], lo7,
                                     axis=1)
            g1 = jnp.take_along_axis(scratch[1][off : off + _SUB, :], lo7,
                                     axis=1)
            g = jnp.where(lo < 128, g0, g1)
        p = vals_ref[off : off + _SUB, :] * g

        # stage 3: MXU prefix sum + boundary gather.  H[mr, r] = sum of
        # the micro-row's entries in window-rows <= r (CUMULATIVE: the
        # per-row difference is linear and therefore deferred past
        # accumulation to a single end-of-kernel pass, removing a per-step
        # lane roll that measured 25% of the step cost).
        # Two-pass bf16 split: U is exact in bf16, p_hi+p_lo covers ~16
        # mantissa bits of p, passes accumulate in f32 on the MXU.  -8% vs
        # Precision.HIGHEST; error ~2^-17 x row L1 (see module docstring).
        p_hi = p.astype(jnp.bfloat16)
        p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        Ub = U.astype(jnp.bfloat16)
        c = jax.lax.dot_general(
            p_hi, Ub, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            p_lo, Ub, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # exclusive prefix at epos: rows with zero entries in this
        # micro-row read c[0] = 0 naturally (no clamp, no select)
        Hs.append(jnp.take_along_axis(c, epos, axis=1))

    # stage 4: accumulate the cumulative sums into the output, straight
    # off the H values (Python loop -> static slices).  The layout pads
    # stripes to ACC_GROUP micro-rows, so each aligned group shares one
    # row window: one sublane-sum + one RMW per ACC_GROUP micro-rows.
    for s_ in range(_NSUB):
        off = s_ * _SUB
        H = Hs[s_]
        for i in range(_SUB // ACC_GROUP):
            base = i * ACC_GROUP
            rb = rbcb_ref[off + base] >> 16
            win = jnp.sum(H[base : base + ACC_GROUP], axis=0, keepdims=True)
            out_ref[pl.ds(rb, 1), :] += win

    # final pass: one lane-shifted difference turns the accumulated
    # cumulative sums into per-row results
    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        acc_c = out_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, acc_c.shape, 1)
        sh = pltpu.roll(acc_c, 1, axis=1)
        out_ref[:] = acc_c - jnp.where(lane == 0, 0.0, sh)


@functools.partial(
    jax.jit,
    static_argnames=("m_pad", "rb_count", "cb_count", "wb", "pair", "interpret"),
)
def _spmv_call(
    vals, meta, rbcb, x_pad, m_pad: int, rb_count: int, cb_count: int,
    interpret: bool, wb: int = 1, pair: int = 1,
):
    n_steps = m_pad // MR_BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((MR_BLOCK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((MR_BLOCK, LANE), lambda i: (i, 0)),
            pl.BlockSpec((MR_BLOCK, LANE), lambda i: (i, 0)),
            # x stays whole in VMEM across all steps
            pl.BlockSpec((cb_count, LANE), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb_count, LANE), lambda i: (0, 0)),
        scratch_shapes=[pltpu.VMEM((MR_BLOCK, LANE), jnp.float32)] * wb,
    )
    return pl.pallas_call(
        functools.partial(_spmv_kernel, wb=wb, pair=pair),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rb_count, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * LANE * LANE,
            bytes_accessed=m_pad * LANE * 6 + cb_count * LANE * 4 + rb_count * LANE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rbcb, vals, meta, x_pad)


@functools.partial(
    jax.jit,
    static_argnames=("m_pad", "rb_count", "cb_count", "wb", "pair", "interpret"),
)
def _spmv_call_bucket(
    vals, meta, rbcb, x_pad, held, m_pad: int, rb_count: int, cb_count: int,
    interpret: bool, wb: int = 1, pair: int = 1,
):
    """SpMV over ONE bucket of stacked micro-block layouts.

    ``vals``/``meta`` are (B, M, 128), ``rbcb`` is (B, M); ``held`` (a
    length-1 i32 array) selects the bucket.  The bucket index rides the
    scalar-prefetch channel so the block index maps stream only the
    selected bucket's blocks from HBM — no gather/copy of the bucket
    materializes (the TPU-idiomatic alternative to a ``lax.switch`` fan
    or a dynamic-slice copy).  Used by the ring schedule
    (:mod:`csr_tpu.parallel.mb_ring`), where the bucket is the column
    shard currently held."""
    n_steps = m_pad // MR_BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((None, MR_BLOCK), lambda i, h: (h[0], i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, MR_BLOCK, LANE), lambda i, h: (h[0], i, 0)),
            pl.BlockSpec((None, MR_BLOCK, LANE), lambda i, h: (h[0], i, 0)),
            pl.BlockSpec((cb_count, LANE), lambda i, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb_count, LANE), lambda i, h: (0, 0)),
        scratch_shapes=[pltpu.VMEM((MR_BLOCK, LANE), jnp.float32)] * wb,
    )
    def kernel(held_ref, *refs):
        # the scalar-prefetch operand arrives as the leading ref; it is
        # consumed by the index maps only
        del held_ref
        _spmv_kernel(*refs, wb=wb, pair=pair)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rb_count, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * LANE * LANE,
            bytes_accessed=m_pad * LANE * 6 + cb_count * LANE * 4
            + rb_count * LANE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(held, rbcb, vals, meta, x_pad)


def build_large_layouts(
    nrows: int, ncols: int, rp, cols, vals, *, max_windows: int
):
    """Chunk/panel micro-block layouts for matrices whose operand or
    output exceeds the kernel's VMEM residency budget.

    The kernel keeps the whole dense operand (``cb_count`` 128-lane vregs)
    and output (``rb_count``) in VMEM; ``max_windows`` caps each.  Rows
    are split into chunks of ``max_windows * 128`` rows and each chunk's
    columns into panels of ``max_windows`` windows; each (chunk, panel)
    submatrix packs independently (its (rb, cb) groups — and therefore
    its fill — are identical to the unsplit layout: panels are unions of
    whole windows).  SpMV then runs one kernel call per panel,
    accumulating panel partials, and concatenates chunk outputs — the
    any-shape behavior of the reference's flat loop
    (reference: csr/kernels/numba/__init__.py:55-67, 2.5B-nnz smoke
    tests/test_mkl.py:94-125) without the VMEM cliff.

    Returns a list of row chunks: ``(chunk_nrows, [(col_window_off,
    layout), ...])`` with empty panels dropped.
    """
    rp = np.asarray(rp)
    cols = np.asarray(cols)
    chunk_rows = max_windows * LANE
    panel_cols = max_windows * LANE
    chunks = []
    for r0 in range(0, max(nrows, 1), chunk_rows):
        r1 = min(nrows, r0 + chunk_rows)
        s0, s1 = int(rp[r0]), int(rp[r1])
        crp = (rp[r0 : r1 + 1] - rp[r0]).astype(np.int64)
        ccols = cols[s0:s1]
        cvals = None if vals is None else vals[s0:s1]
        cn = r1 - r0
        panels = []
        n_panels = -(-max(ncols, 1) // panel_cols)
        if n_panels <= 1:
            if s1 > s0:
                panels.append((0, build_microblocks_host(
                    cn, ncols, crp, ccols, cvals)))
        else:
            rows = np.repeat(np.arange(cn, dtype=np.int64), np.diff(crp))
            pid = ccols.astype(np.int64) // panel_cols
            for p in range(n_panels):
                mask = pid == p
                if not mask.any():
                    continue
                pc = (ccols[mask] - p * panel_cols).astype(np.int32)
                prp = np.zeros(cn + 1, np.int64)
                np.cumsum(np.bincount(rows[mask], minlength=cn), out=prp[1:])
                pv = None if cvals is None else cvals[mask]
                pncols = min(ncols - p * panel_cols, panel_cols)
                panels.append((p * max_windows, build_microblocks_host(
                    cn, pncols, prp, pc, pv)))
        chunks.append((cn, panels))
    return chunks


def spmv_large(chunks, ncols: int, x, *, interpret: bool = False):
    """``A @ x`` over :func:`build_large_layouts` output.  Returns f32."""
    x = jnp.asarray(x).astype(jnp.float32)
    n_cb = max(-(-ncols // LANE), 1)
    x_pad = jnp.zeros((n_cb * LANE,), jnp.float32).at[:ncols].set(x)
    x_pad = x_pad.reshape(n_cb, LANE)
    outs = []
    for cn, panels in chunks:
        acc = None
        for cb_off, layout in panels:
            cb_count = max(layout.cb_count, 1)
            xp = jax.lax.dynamic_slice(
                x_pad, (cb_off, 0), (min(cb_count, n_cb - cb_off), LANE)
            )
            if xp.shape[0] < cb_count:  # last panel: pad to whole windows
                xp = jnp.zeros((cb_count, LANE), jnp.float32).at[
                    : xp.shape[0]
                ].set(xp)
            y = _spmv_call(
                layout.vals, layout.meta, layout.rbcb, xp,
                layout.vals.shape[0], max(layout.rb_count, 1), cb_count,
                interpret, wb=layout.window // LANE, pair=layout.pair,
            )
            acc = y if acc is None else acc + y
        if acc is None:
            outs.append(jnp.zeros((cn,), jnp.float32))
        else:
            outs.append(acc.reshape(-1)[:cn])
    if not outs:
        return jnp.zeros((0,), jnp.float32)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def spmv(layout: MicroBlockLayout, x, *, interpret: bool = False):
    """Compute ``A @ x`` for a micro-block matrix.  Returns float32."""
    cb_count = max(layout.cb_count, 1)
    rb_count = max(layout.rb_count, 1)
    x = x.astype(jnp.float32)
    x_pad = jnp.zeros((cb_count * LANE,), jnp.float32).at[: layout.ncols].set(x)
    x_pad = x_pad.reshape(cb_count, LANE)
    m_pad = layout.vals.shape[0]
    y_mat = _spmv_call(
        layout.vals, layout.meta, layout.rbcb, x_pad,
        m_pad, rb_count, cb_count, interpret,
        wb=layout.window // LANE, pair=layout.pair,
    )
    return y_mat.reshape(-1)[: layout.nrows]
