"""
Ring SpMV on the Pallas micro-block kernel: production overlap schedule.

:mod:`csr_tpu.parallel.ring` established the schedule — each device holds
one column shard of the dense operand, computes the sub-matrix whose
columns it currently holds while ``ppermute`` rotates shards around the
ICI ring — but ran the ~1000x-slower XLA segment-sum local compute and a
``lax.switch`` fan whose compile cost grows with the device count.  This
module joins the schedule with the tuned micro-block kernel:

* each row shard's entries are bucketed by source column shard and each
  bucket is micro-block-packed with columns rebased to the shard (the
  column-shard width is a multiple of the window, so every micro-row
  falls in exactly one bucket);
* at ring step ``s`` the device runs the Pallas SpMV over bucket
  ``held = (me + s) % D`` — the bucket index rides the scalar-prefetch
  channel into the kernel's block index maps
  (:func:`csr_tpu.ops.spmv._spmv_call_bucket`), so only the held
  bucket's blocks stream from HBM: no switch fan, no bucket copy;
* the ``ppermute`` for the next shard is issued before the local
  compute, letting XLA overlap communication with the kernel.

This is the halo-overlap configuration BASELINE.md's weak-scaling target
describes (the distributed generalization of the reference's capacity
row sharding, reference: csr/csr.py:599-650).
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
from .partition import balanced_col_splits, balanced_row_splits


@dataclass
class RingMicroBlock:
    """Row-sharded, column-bucketed micro-block form.

    ``vals``/``meta`` are (D, D, M, 128) and ``rbcb`` (D, D, M):
    ``[row shard, column bucket, micro-row, slot]``, the leading axis laid
    over the mesh.  Columns inside bucket k are rebased by
    ``k * cols_per_shard``."""

    nrows: int
    ncols: int
    nnz: int
    n_shards: int
    rows_per_shard: int  # padded local row count (uniform)
    cols_per_shard: int  # operand slice per device (window-aligned)
    window: int
    pair: int
    vals: jax.Array  # (D, D, M, 128) f32
    meta: jax.Array  # (D, D, M, 128) u16
    rbcb: jax.Array  # (D, D, M) i32
    row_offset: np.ndarray  # (D,) host
    nrows_local: np.ndarray  # (D,) host
    col_offset: np.ndarray = None  # (D+1,) host: nnz-balanced column splits

    @property
    def rb_count(self) -> int:
        return max(-(-self.rows_per_shard // mb.LANE), 1)

    @property
    def cb_count(self) -> int:
        """Operand vregs per ring step (one column shard)."""
        wb = self.window // mb.LANE
        return max(wb * -(-self.cols_per_shard // self.window), 1)

    @property
    def nbytes(self) -> int:
        return self.vals.nbytes + self.meta.nbytes + self.rbcb.nbytes

    def shard(self, mesh: Mesh, axis: str = "rows") -> "RingMicroBlock":
        sh = NamedSharding(mesh, P(axis))
        return RingMicroBlock(
            self.nrows, self.ncols, self.nnz, self.n_shards,
            self.rows_per_shard, self.cols_per_shard, self.window, self.pair,
            jax.device_put(self.vals, sh),
            jax.device_put(self.meta, sh),
            jax.device_put(self.rbcb, sh),
            self.row_offset, self.nrows_local, self.col_offset,
        )


def partition_ring_mb(
    csr, n_shards: int, *, window: int | None = None
) -> RingMicroBlock:
    """Bucket a CSR by (row shard, column shard) and micro-block-pack
    every bucket (columns rebased to the shard)."""
    rp = np.asarray(csr.rowptrs)
    cis = np.asarray(csr.colinds)
    vls = (
        np.ones(csr.nnz, np.float32)
        if csr.values is None
        else np.asarray(csr.values, dtype=np.float32)
    )
    if csr.nnz:
        w_, p_ = mb.choose_layout(rp, cis, csr.ncols)
    else:
        w_, p_ = mb.LANE, 1
    if window is None:
        window = w_
    pair = p_ if window == w_ else 1

    splits = balanced_row_splits(rp, n_shards)
    rows_per = max(int(np.max(np.diff(splits))), 1)
    rows_per = -(-rows_per // mb.LANE) * mb.LANE
    # nnz-balanced, window-aligned column shards: every micro-row lands in
    # one bucket, and buckets stay near nnz/D even on column-skewed
    # matrices (uniform splits inflate the padded max bucket up to Dx)
    csplits = balanced_col_splits(cis, csr.ncols, n_shards, align=window)
    cols_per = max(int(np.max(np.diff(csplits))), 1)
    cols_per = -(-cols_per // window) * window

    layouts = []
    for d in range(n_shards):
        r0, r1 = int(splits[d]), int(splits[d + 1])
        s0, s1 = int(rp[r0]), int(rp[r1])
        lcis = cis[s0:s1]
        lvls = vls[s0:s1]
        lrids = (
            np.repeat(np.arange(r0, r1), np.diff(rp[r0 : r1 + 1]))
            - r0
        ).astype(np.int64)
        shard_of_col = np.searchsorted(csplits[1:], lcis, side="right")
        row_buckets = []
        for k in range(n_shards):
            sel = shard_of_col == k
            bc = (lcis[sel] - csplits[k]).astype(np.int32)
            br = lrids[sel]
            # rebuild a local CSR for the bucket
            brp = np.zeros(rows_per + 1, np.int64)
            np.cumsum(np.bincount(br, minlength=rows_per), out=brp[1:])
            order = np.argsort(br, kind="stable")
            row_buckets.append(
                mb.build_microblocks_host(
                    rows_per, cols_per, brp, bc[order], lvls[sel][order],
                    window=window, pair=pair,
                )
            )
        layouts.append(row_buckets)

    m_pad = max(l.vals.shape[0] for row in layouts for l in row)
    D = n_shards
    vals = np.zeros((D, D, m_pad, mb.LANE), np.float32)
    meta = np.zeros((D, D, m_pad, mb.LANE), np.uint16)
    rbcb = np.zeros((D, D, m_pad), np.int32)
    for d in range(D):
        for k in range(D):
            l = layouts[d][k]
            m = l.vals.shape[0]
            vals[d, k, :m] = np.asarray(l.vals)
            meta[d, k, :m] = np.asarray(l.meta)
            rbcb[d, k, :m] = np.asarray(l.rbcb)

    return RingMicroBlock(
        csr.nrows, csr.ncols, csr.nnz, n_shards, rows_per, cols_per, window,
        pair,
        jnp.asarray(vals), jnp.asarray(meta), jnp.asarray(rbcb),
        splits[:-1].astype(np.int64), np.diff(splits).astype(np.int64),
        csplits,
    )


def scatter_x(rmb: RingMicroBlock, x, mesh: Mesh, axis: str = "rows"):
    """Column-shard the dense operand along the nnz-balanced splits:
    (D, cols_per_shard), each shard's slice zero-padded to the uniform
    width."""
    d, cp = rmb.n_shards, rmb.cols_per_shard
    xs = np.zeros((d, cp), np.float32)
    xv = np.asarray(x, np.float32)
    cs = rmb.col_offset
    for k in range(d):
        w = int(cs[k + 1] - cs[k])
        xs[k, :w] = xv[cs[k] : cs[k + 1]]
    arr = jnp.asarray(xs)
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def spmv_ring_mb(rmb: RingMicroBlock, x_sharded, mesh: Mesh,
                 axis: str = "rows", *, interpret: bool = False):
    """``y = A @ x`` with x column-sharded, shards rotating on the ICI
    ring, local compute on the Pallas micro-block kernel.  Returns y as
    (D, rows_per_shard), row-sharded."""
    D = rmb.n_shards
    cb = rmb.cb_count
    rb = rmb.rb_count
    m_pad = rmb.vals.shape[2]
    wb = rmb.window // mb.LANE
    rows_per = rmb.rows_per_shard
    pad_to = cb * mb.LANE

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _run(vals, meta, rbcb, x_part):
        me = jax.lax.axis_index(axis)
        perm = [(i, (i - 1) % D) for i in range(D)]

        def step(k, carry):
            x_cur, acc = carry
            held = ((me + k) % D).astype(jnp.int32)
            # issue the rotate FIRST so it overlaps the local kernel
            x_next = jax.lax.ppermute(x_cur, axis, perm)
            xp = jnp.zeros((pad_to,), jnp.float32).at[: x_cur.shape[1]].set(
                x_cur[0]
            )
            y = spmv_op._spmv_call_bucket(
                vals[0], meta[0], rbcb[0], xp.reshape(cb, mb.LANE),
                held[None], m_pad, rb, cb, interpret, wb=wb, pair=rmb.pair,
            )
            return (x_next, acc + y.reshape(-1)[:rows_per])

        acc0 = jnp.zeros(rows_per, jnp.float32)
        _, acc = jax.lax.fori_loop(0, D, step, (x_part, acc0))
        return acc[None, :]

    return _run(rmb.vals, rmb.meta, rmb.rbcb, x_sharded)


def collect_rows(rmb: RingMicroBlock, y_sharded):
    """Assemble the global dense result from row-sharded outputs."""
    y = np.asarray(y_sharded)
    parts = [y[d, : int(rmb.nrows_local[d])] for d in range(rmb.n_shards)]
    return jnp.concatenate([jnp.asarray(p) for p in parts], axis=0)
