"""
Distributed micro-block SpMV: the Pallas kernel under ``shard_map``.

:mod:`csr_tpu.parallel.dist` runs XLA segment-sum compute per shard —
fine as a portable reference, but ~1000x off roofline on real TPU chips
(docs/perf.md).  This module is the production path: rows are partitioned
into nnz-balanced shards (the multi-device generalization of reference
csr/csr.py:599-650), each shard is packed into the micro-block layout
(:mod:`csr_tpu.ops.microblock`), the stacked layouts are laid out over
``mesh[axis]``, and every device runs the tuned Pallas SpMV kernel on its
shard.

Two dense-operand strategies:

* :func:`spmv`      — x replicated; no collectives in the hot loop.
* :func:`spmv_halo` — x column-sharded over the same axis; each device
  ``all_gather``\\ s the operand over ICI before local Pallas compute (XLA
  overlaps the gather with leading compute).  This is the weak-scaling
  form: per-device HBM holds only its row shard plus one operand copy.

Shapes are uniform across shards (micro-row counts padded to the max, row
windows padded to the max shard height) so the leading axis shards
cleanly; padded slots carry zero values and never affect results.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from csr_tpu.ops import microblock as mb
from csr_tpu.ops import spmv as spmv_op
from .partition import balanced_row_splits


@dataclass
class DistMicroBlock:
    """Row-sharded micro-block form: per-shard layouts stacked on a
    leading device axis."""

    nrows: int
    ncols: int
    nnz: int
    n_shards: int
    rows_per_shard: int  # padded local row count (uniform)
    window: int
    pair: int
    vals: jax.Array  # (D, M, 128) f32
    meta: jax.Array  # (D, M, 128) u16
    rbcb: jax.Array  # (D, M) i32
    row_offset: np.ndarray  # (D,) host
    nrows_local: np.ndarray  # (D,) host

    @property
    def rb_count(self) -> int:
        """Per-shard output row windows."""
        return -(-self.rows_per_shard // mb.LANE)

    @property
    def cb_count(self) -> int:
        wb = self.window // mb.LANE
        return wb * -(-self.ncols // self.window)

    @property
    def cols_per_shard(self) -> int:
        """Per-device operand slice length for the halo form (lane-aligned)."""
        per = -(-self.ncols // self.n_shards)
        return -(-per // mb.LANE) * mb.LANE

    @property
    def nbytes(self) -> int:
        return self.vals.nbytes + self.meta.nbytes + self.rbcb.nbytes

    def shard(self, mesh: Mesh, axis: str = "rows") -> "DistMicroBlock":
        sh = NamedSharding(mesh, P(axis))
        return DistMicroBlock(
            self.nrows, self.ncols, self.nnz, self.n_shards,
            self.rows_per_shard, self.window, self.pair,
            jax.device_put(self.vals, sh),
            jax.device_put(self.meta, sh),
            jax.device_put(self.rbcb, sh),
            self.row_offset, self.nrows_local,
        )


def partition_microblocks(
    csr, n_shards: int, *, window: int | None = None
) -> DistMicroBlock:
    """Partition rows (nnz-balanced) and micro-block-pack each shard.

    The window width is chosen once for the whole matrix so every shard
    runs the same kernel variant."""
    rp = np.asarray(csr.rowptrs)
    cis = np.asarray(csr.colinds)
    vls = None if csr.values is None else np.asarray(csr.values)
    splits = balanced_row_splits(rp, n_shards)
    rows_per = max(int(np.max(np.diff(splits))), 1)
    # round the padded shard height to whole row windows
    rows_per = -(-rows_per // mb.LANE) * mb.LANE
    if csr.nnz:
        w_, p_ = mb.choose_layout(rp, cis, csr.ncols)
    else:
        w_, p_ = mb.LANE, 1
    if window is None:
        window = w_
    pair = p_ if window == w_ else 1

    layouts = []
    for d in range(n_shards):
        r0, r1 = int(splits[d]), int(splits[d + 1])
        s0, s1 = int(rp[r0]), int(rp[r1])
        lrp = (rp[r0 : r1 + 1] - rp[r0]).astype(np.int64)
        # pad local rowptrs to the uniform shard height (empty rows)
        lrp = np.concatenate([lrp, np.full(rows_per - (r1 - r0), lrp[-1])])
        layouts.append(
            mb.build_microblocks_host(
                rows_per, csr.ncols, lrp, cis[s0:s1],
                None if vls is None else vls[s0:s1], window=window,
                pair=pair,
            )
        )

    m_pad = max(l.vals.shape[0] for l in layouts)
    vals = np.zeros((n_shards, m_pad, mb.LANE), np.float32)
    meta = np.zeros((n_shards, m_pad, mb.LANE), np.uint16)
    rbcb = np.zeros((n_shards, m_pad), np.int32)
    for d, l in enumerate(layouts):
        m = l.vals.shape[0]
        vals[d, :m] = np.asarray(l.vals)
        meta[d, :m] = np.asarray(l.meta)
        rbcb[d, :m] = np.asarray(l.rbcb)

    return DistMicroBlock(
        csr.nrows, csr.ncols, csr.nnz, n_shards, rows_per, window, pair,
        jnp.asarray(vals), jnp.asarray(meta), jnp.asarray(rbcb),
        splits[:-1].astype(np.int64), np.diff(splits).astype(np.int64),
    )


def _pad_x(dmb: DistMicroBlock, x):
    cb = max(dmb.cb_count, 1)
    x = jnp.asarray(x).astype(jnp.float32)
    xp = jnp.zeros((cb * mb.LANE,), jnp.float32).at[: dmb.ncols].set(x)
    return xp.reshape(cb, mb.LANE)


def spmv(dmb: DistMicroBlock, x, mesh: Mesh, axis: str = "rows",
         *, interpret: bool = False):
    """``y = A @ x`` with x replicated; every device runs the Pallas
    micro-block kernel on its row shard.  Returns (D, rows_per_shard)
    row-sharded; use :func:`collect_rows` for the global vector."""
    cb = max(dmb.cb_count, 1)
    rb = max(dmb.rb_count, 1)
    m_pad = dmb.vals.shape[1]
    wb = dmb.window // mb.LANE

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def _run(vals, meta, rbcb, xp):
        y = spmv_op._spmv_call(
            vals[0], meta[0], rbcb[0], xp, m_pad, rb, cb, interpret,
            wb=wb, pair=dmb.pair,
        )
        return y.reshape(1, rb * mb.LANE)

    return _run(dmb.vals, dmb.meta, dmb.rbcb, _pad_x(dmb, x))[
        :, : dmb.rows_per_shard
    ]


def spmv_halo(dmb: DistMicroBlock, x_sharded, mesh: Mesh, axis: str = "rows",
              *, interpret: bool = False):
    """``y = A @ x`` with the dense operand column-sharded over the same
    mesh axis: ``x_sharded`` is (D, cols_per_shard) holding x's slice
    ``[d*cols_per : (d+1)*cols_per]`` on device d (zero-padded past ncols).

    Each device ``all_gather``\\ s the operand (ICI) and runs the local
    Pallas kernel; per-device HBM holds only the row shard plus one
    gathered operand copy, making this the weak-scaling iteration form
    (BASELINE.md multi-host target)."""
    cb = max(dmb.cb_count, 1)
    rb = max(dmb.rb_count, 1)
    m_pad = dmb.vals.shape[1]
    wb = dmb.window // mb.LANE
    rows_per = dmb.rows_per_shard
    pad_to = cb * mb.LANE

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _run(vals, meta, rbcb, x_part):
        xg = jax.lax.all_gather(x_part.reshape(-1), axis, tiled=True)
        n = min(pad_to, xg.shape[0])
        xp = jnp.zeros((pad_to,), jnp.float32).at[:n].set(xg[:n])
        y = spmv_op._spmv_call(
            vals[0], meta[0], rbcb[0], xp.reshape(cb, mb.LANE),
            m_pad, rb, cb, interpret, wb=wb, pair=dmb.pair,
        )
        return y.reshape(1, rb * mb.LANE)[:, :rows_per]

    return _run(dmb.vals, dmb.meta, dmb.rbcb, x_sharded)


@dataclass
class DistMicroBlockT:
    """Transposed row shards for distributed ``A^T @ y``.

    Device ``d`` holds the micro-block layout of ``(A_d)^T`` where ``A_d``
    is row shard ``d`` of A — the distributed generalization of the
    reference's transpose-then-multiply structure
    (reference: csr/kernels/numba/multiply.py:41-57).  Each device's local
    product covers the FULL column space (its shard's contribution), so
    results combine with one ``psum`` (replicated output) or
    ``psum_scatter`` (column-sharded output) over ICI — never a dense
    scatter-add over the column space.
    """

    nrows: int
    ncols: int
    nnz: int
    n_shards: int
    rows_per_shard: int  # padded local OPERAND length (uniform, lane-aligned)
    window: int
    pair: int
    vals: jax.Array  # (D, M, 128) f32
    meta: jax.Array  # (D, M, 128) u16
    rbcb: jax.Array  # (D, M) i32
    row_offset: np.ndarray  # (D,) host
    nrows_local: np.ndarray  # (D,) host

    @property
    def rb_count(self) -> int:
        """Output row windows: the full column space of A."""
        return max(-(-self.ncols // mb.LANE), 1)

    @property
    def cb_count(self) -> int:
        """Per-device operand vregs (covers the local row shard of A)."""
        wb = self.window // mb.LANE
        return max(wb * -(-self.rows_per_shard // self.window), 1)

    @property
    def nbytes(self) -> int:
        return self.vals.nbytes + self.meta.nbytes + self.rbcb.nbytes

    def shard(self, mesh: Mesh, axis: str = "rows") -> "DistMicroBlockT":
        sh = NamedSharding(mesh, P(axis))
        return DistMicroBlockT(
            self.nrows, self.ncols, self.nnz, self.n_shards,
            self.rows_per_shard, self.window, self.pair,
            jax.device_put(self.vals, sh),
            jax.device_put(self.meta, sh),
            jax.device_put(self.rbcb, sh),
            self.row_offset, self.nrows_local,
        )


def partition_microblocks_t(
    csr, n_shards: int, *, window: int | None = None
) -> DistMicroBlockT:
    """Row-partition A (nnz-balanced), transpose each shard on the host
    (native C++ counting sort when available), and micro-block-pack the
    transposes.  One window width serves all shards so every device runs
    the same kernel variant."""
    from csr_tpu import native

    rp = np.asarray(csr.rowptrs)
    cis = np.asarray(csr.colinds)
    vls = (
        np.ones(csr.nnz, np.float32)
        if csr.values is None
        else np.asarray(csr.values, dtype=np.float32)
    )
    splits = balanced_row_splits(rp, n_shards)
    rows_per = max(int(np.max(np.diff(splits))), 1)
    rows_per = -(-rows_per // mb.LANE) * mb.LANE

    shard_t = []
    for d in range(n_shards):
        r0, r1 = int(splits[d]), int(splits[d + 1])
        s0, s1 = int(rp[r0]), int(rp[r1])
        lrp = (rp[r0 : r1 + 1] - rp[r0]).astype(np.int64)
        t_rps, t_cis, t_vls = native.transpose_host(
            r1 - r0, csr.ncols, lrp, cis[s0:s1], vls[s0:s1]
        )
        shard_t.append((t_rps, t_cis, t_vls))

    # uniform (window, pair): 256 only when every shard's cost model
    # picks it; pair = the most conservative per-shard choice, counting a
    # shard's preference only when it was derived at the final window (a
    # pair chosen under the other window's cost tradeoffs may pad fill
    # that pair=1 would avoid — mirror partition_microblocks)
    choices = [
        mb.choose_layout(t[0], t[1], rows_per) for t in shard_t
    ] if csr.nnz else [(mb.LANE, 1)]
    if window is None:
        window = 256 if all(c[0] == 256 for c in choices) else mb.LANE
    pair = min(c[1] if c[0] == window else 1 for c in choices)

    layouts = [
        mb.build_microblocks_host(
            csr.ncols, rows_per, t_rps, t_cis, t_vls, window=window,
            pair=pair,
        )
        for t_rps, t_cis, t_vls in shard_t
    ]

    m_pad = max(l.vals.shape[0] for l in layouts)
    vals = np.zeros((n_shards, m_pad, mb.LANE), np.float32)
    meta = np.zeros((n_shards, m_pad, mb.LANE), np.uint16)
    rbcb = np.zeros((n_shards, m_pad), np.int32)
    for d, l in enumerate(layouts):
        m = l.vals.shape[0]
        vals[d, :m] = np.asarray(l.vals)
        meta[d, :m] = np.asarray(l.meta)
        rbcb[d, :m] = np.asarray(l.rbcb)

    return DistMicroBlockT(
        csr.nrows, csr.ncols, csr.nnz, n_shards, rows_per, window, pair,
        jnp.asarray(vals), jnp.asarray(meta), jnp.asarray(rbcb),
        splits[:-1].astype(np.int64), np.diff(splits).astype(np.int64),
    )


def spmv_t(dmbt: DistMicroBlockT, y_sharded, mesh: Mesh, axis: str = "rows",
           *, interpret: bool = False, scatter: bool = False):
    """``x = A^T @ y`` on the Pallas micro-block kernel per device.

    ``y_sharded`` is (D, rows_per_shard) row-sharded (e.g. the output of
    :func:`spmv`).  Each device multiplies its transposed shard by its
    local y slice — a full-column-space partial — and the partials reduce
    with ``psum`` (returns the replicated dense vector of length ncols) or,
    with ``scatter=True``, ``psum_scatter`` (returns (D, ncols_pad/D)
    column-sharded, the weak-scaling form that keeps per-device output
    HBM at 1/D).
    """
    cb = dmbt.cb_count
    rb = dmbt.rb_count
    m_pad = dmbt.vals.shape[1]
    wb = dmbt.window // mb.LANE
    pad_to = cb * mb.LANE
    out_pad = rb * mb.LANE
    D = dmbt.n_shards
    # psum_scatter needs the scattered axis divisible by D
    out_scat = -(-out_pad // (D * mb.LANE)) * (D * mb.LANE)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis) if scatter else P(),
        check_vma=False,
    )
    def _run(vals, meta, rbcb, y_part):
        yv = y_part.reshape(-1)
        xp = jnp.zeros((pad_to,), jnp.float32).at[: yv.shape[0]].set(yv)
        out = spmv_op._spmv_call(
            vals[0], meta[0], rbcb[0], xp.reshape(cb, mb.LANE),
            m_pad, rb, cb, interpret, wb=wb, pair=dmbt.pair,
        ).reshape(-1)
        if scatter:
            part = jnp.zeros((out_scat,), jnp.float32).at[:out_pad].set(out)
            return jax.lax.psum_scatter(
                part.reshape(D, out_scat // D), axis, scatter_dimension=0,
                tiled=True,
            ).reshape(1, out_scat // D)
        return jax.lax.psum(out, axis)

    out = _run(dmbt.vals, dmbt.meta, dmbt.rbcb, y_sharded)
    if scatter:
        return out
    return out[: dmbt.ncols]


def collect_cols_t(dmbt: DistMicroBlockT, x_scattered):
    """Assemble the dense ``A^T y`` result from the ``scatter=True`` form
    of :func:`spmv_t` (column-sharded partials)."""
    return jnp.asarray(x_scattered).reshape(-1)[: dmbt.ncols]


def scatter_x(dmb: DistMicroBlock, x, mesh: Mesh, axis: str = "rows"):
    """Column-shard a dense operand for :func:`spmv_halo`:
    (D, cols_per_shard) with x laid out contiguously and zero-padded."""
    d, cp = dmb.n_shards, dmb.cols_per_shard
    xp = np.zeros(d * cp, np.float32)
    xv = np.asarray(x, np.float32)
    xp[: len(xv)] = xv
    arr = jnp.asarray(xp.reshape(d, cp))
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def collect_rows(dmb: DistMicroBlock, y_sharded):
    """Assemble the global dense result from row-sharded per-shard outputs
    (the distributed analog of reference csr/csr.py:623-650)."""
    y = np.asarray(y_sharded)
    parts = [y[d, : int(dmb.nrows_local[d])] for d in range(dmb.n_shards)]
    return jnp.concatenate([jnp.asarray(p) for p in parts], axis=0)
