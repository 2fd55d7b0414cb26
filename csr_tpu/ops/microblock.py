"""
Micro-block CSR layout for TPU sparse kernels.

Why this layout
---------------

The TPU vector unit has exactly one random-access primitive:
``tpu.dynamic_gather``, which gathers *within a single 128-lane vector
register*.  There is no vector scatter, and XLA's general gather lowers to
a per-element loop that runs ~1000x below HBM bandwidth (measured on
v5e).  A fast sparse kernel therefore has to organize every random access
so that it happens inside one 128-element window.

The micro-block layout does that for both sides of an SpMV/SpMM at once.
Stored entries are reordered (a static, per-matrix preprocessing step —
the TPU analog of the reference's ``to_handle`` preprocessing,
reference: csr/kernels/mkl/handle.py:61-70) into *micro-rows* of up to 128
entries such that each micro-row:

1. lies in a single aligned 128-column window ``cb`` — so the dense
   operand values for all 128 entries come from one vreg via ONE
   ``dynamic_gather``;
2. lies in a single aligned 128-row window ``rb`` — so its per-row partial
   sums form a dense 128-vector that accumulates into the output with ONE
   vector add (no scatter);
3. is sorted by row — so per-row sums reduce to a lane cumsum plus one
   gather at precomputed row-boundary positions (``epos``).

This turns SpMV into ~0.05 vector instructions per stored entry, against
an HBM roofline of ~0.014-0.06 (v5e), i.e. the kernel runs at a large
fraction of memory speed-of-light instead of being gather-bound.

The price is padding: the expected fill of a micro-row is roughly
``min(1, 128 * 128 * density / 128)`` for uniformly random matrices, so
density >= ~0.006 packs densely while very sparse matrices pad.  Poor
fill does NOT route away from this kernel: even at fill ~0.01 the
padded micro-block stream beats XLA's gather/segment-sum path (measured
~0.06 Gnnz/s, ~1000x off roofline — docs/perf.md), so the pallas
backend uses the micro-block kernel whenever it is *viable* (f32 and
operand/output within VMEM; see ``_pallas_viable`` in
:mod:`csr_tpu.kernels.pallas`) and pays the padding.

**Double-width windows.** At moderate densities the 128-column window is
the fill bottleneck (d=0.01 on 32k^2: fill 0.64).  The layout therefore
supports a 256-column window variant (``window=256``): each micro-row
lies in an aligned 256-column window, the kernel assembles two operand
vregs per micro-row and picks between two ``dynamic_gather`` results with
one select.  Measured fill at d=0.01 rises to 0.85 (25% fewer micro-rows)
for ~3 extra full-block ops per step.  ``build_microblocks`` estimates
the micro-row count for both widths and picks the cheaper layout under a
measured cost model.

Layout arrays (``M`` = number of micro-rows, padded to a block multiple):

``vals``  (M, 128) float32 — entry values (0 in padding slots)
``meta``  (M, 128) uint16  — packed ``lo | epos << s`` per slot
                             (``s`` = 7 for 128-wide, 8 for 256-wide):
                             ``lo``   (7/8 bits) entry column offset
                                      within the window;
                             ``epos`` (7 bits, in [0, 127] — micro-rows
                                      hold <= SLOT_CAP = 127 entries)
                                      #entries in the micro-row with
                                      local row <= lane (row-boundary
                                      prefix counts; the kernel gathers
                                      an EXCLUSIVE prefix sum at epos,
                                      clamp- and select-free)
``rbcb``  (M,)     int32   — packed ``rb << 16 | cb`` window coordinates
                             (``cb`` in units of ``window`` columns)

The u16 packing matters: the kernels stream 6 B per slot instead of 12,
which halves both the HBM traffic and the device-memory footprint of a
handle (measured: ~5% faster SpMV; the kernel is compute-bound, see
docs/perf.md).

**Pair mode.** The SpMV build loop is scalar-core bound: it issues one
operand address per micro-row (8 per vector register), and at the
flagship that addressing is ~35% of the whole step.  ``pair = P`` pads
every (rb, cb) group's micro-row count to a multiple of P, so aligned
P-length micro-row runs share one column window and the build loop
issues ``8/P`` addresses per vreg.  At densities where groups naturally
span >= P micro-rows the padding is free — the 10.7M-nnz flagship
(groups ~2.6 micro-rows) runs pair=2 with *zero* added padding at
-21%/step (2.45 -> 1.94 us per 1024 micro-rows, v5e).  Where groups are
smaller, padding costs fill; :func:`choose_layout` picks (window, pair)
by a measured cost model.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

LANE = 128
#: entries per micro-row (one less than the 128 slots): capping at 127
#: keeps the row-boundary prefix count epos in [0, 127], so the SpMV
#: kernel's boundary gather index is PROVABLY lane-bounded after an
#: ``& 127`` and the gather needs no clamp and no epos==0 select —
#: measured -2.5%/step on v5e for 1/128 fill (docs/perf.md round-4;
#: the round-2 "127-cap dead end" lacked the provable bound and lost).
#: Slot 127 of every micro-row is padding (value 0, lo 0).
SLOT_CAP = 127
#: micro-rows per kernel grid step (a multiple of 1024 keeps 1-D int32
#: operand layouts aligned with XLA tiling T(1024); 2048 halves per-step
#: fixed costs vs 1024 — measured -6% at the 10.7M-nnz flagship)
MR_BLOCK = 2048
#: stripe padding multiple == micro-rows accumulated per output
#: read-modify-write in the SpMV kernel.  32 (4 vregs per RMW) measured
#: 19% faster than 8 on v5e; costs zero extra padding at the flagship
#: (stripes are ~300 micro-rows) and bounded waste at low fill.
ACC_GROUP = 32


@dataclass
class MicroBlockLayout:
    """Device-resident micro-block form of a CSR matrix."""

    nrows: int
    ncols: int
    nnz: int
    n_microrows: int  # before padding
    vals: jax.Array  # (M, 128) f32
    meta: jax.Array  # (M, 128) u16: lo | epos << (7|8)
    rbcb: jax.Array  # (M,) i32
    window: int = LANE  # columns per micro-row window (128 or 256)
    #: aligned micro-row runs guaranteed to share one column window (the
    #: SpMV build loop issues 8/pair operand addresses per vreg)
    pair: int = 1

    @property
    def rb_count(self) -> int:
        return -(-self.nrows // LANE)

    @property
    def cb_count(self) -> int:
        """Dense-operand vregs: 128-lane blocks covering ncols, padded to a
        whole number of windows."""
        wb = self.window // LANE
        return wb * -(-self.ncols // self.window)

    @property
    def fill(self) -> float:
        """Fraction of micro-row slots holding real entries."""
        m = max(self.n_microrows, 1)
        return self.nnz / (m * LANE)

    @property
    def nbytes(self) -> int:
        """Device bytes held by the layout."""
        return self.vals.nbytes + self.meta.nbytes + self.rbcb.nbytes

    @property
    def epos_shift(self) -> int:
        return 7 if self.window == LANE else 8

    def unpack_meta(self):
        """Host-side (numpy) unpacked ``(lo, epos)`` int32 views, for tests
        and debugging."""
        m = np.asarray(self.meta).astype(np.int32)
        s = self.epos_shift
        return m & ((1 << s) - 1), m >> s


def _estimate_multi_numpy(rp, cols, window: int, nrows: int):
    """(m_pair1, m_pair2, m_pair4) stripe-padded micro-row counts, numpy."""
    rids = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(rp))
    shift = int(window).bit_length() - 1
    key = (rids >> 7) << 32 | (np.asarray(cols).astype(np.int64) >> shift)
    uk, counts = np.unique(key, return_counts=True)
    grp_mrs = -(-counts // SLOT_CAP)
    urb = uk >> 32
    new_stripe = np.empty(len(uk), bool)
    new_stripe[0] = True
    new_stripe[1:] = urb[1:] != urb[:-1]
    stripe_id = np.cumsum(new_stripe) - 1
    out = []
    for pair in (1, 2, 4):
        gm = -(-grp_mrs // pair) * pair
        stripe_mrs = np.bincount(stripe_id, weights=gm).astype(np.int64)
        out.append(int((-(-stripe_mrs // ACC_GROUP) * ACC_GROUP).sum()))
    return tuple(out)


def estimate_microrows(rp, cols, window: int, ncols: int | None = None,
                       pair: int = 1) -> int:
    """Stripe-padded micro-row count a build at ``(window, pair)`` would
    produce (host, one sort — cheap relative to the build itself).

    ``ncols`` should be the matrix's true column count so the native
    planner's rb/cb range check agrees with the actual build; it is
    synthesized from ``max(cols)`` only when not provided."""
    assert pair in (1, 2, 4), pair
    nnz = int(len(cols))
    if nnz == 0:
        return 0
    rp = np.asarray(rp)
    nrows = len(rp) - 1
    if ncols is None:
        ncols = int(np.max(cols)) + 1
    from csr_tpu import native

    m = native.plan_microrows(nrows, ncols, rp, cols, window, ACC_GROUP, pair)
    if m is not None:
        return m
    return _estimate_multi_numpy(rp, cols, window, nrows)[(1, 2, 4).index(pair)]


#: measured SpMV step cost (us per 1024 micro-rows, v5e, round-3
#: production kernel, all six combos measured in one session at the
#: 10.7M-nnz flagship) per (window, pair).  Only the *ratios* matter —
#: the chooser minimizes predicted time = m(window, pair) x cost.
STEP_COST = {
    (128, 1): 2.45, (128, 2): 1.98, (128, 4): 1.58,
    (256, 1): 4.42, (256, 2): 2.86, (256, 4): 2.43,
}


def choose_layout(rp, cols, ncols: int | None = None) -> tuple[int, int]:
    """Pick ``(window, pair)`` minimizing predicted SpMV time.

    Predicted time is micro-row count (from one native plan per window
    width, covering all pair paddings) times the measured per-micro-row
    step cost :data:`STEP_COST`.  At the 10.7M-nnz flagship this picks
    (128, 2): pair padding is free there and saves 21%/step; at low
    densities pair padding costs fill and pair=1 wins back."""
    nnz = int(len(cols))
    if nnz == 0:
        return LANE, 1
    rp = np.asarray(rp)
    nrows = len(rp) - 1
    if ncols is None:
        ncols = int(np.max(cols)) + 1
    from csr_tpu import native

    best = None
    for window in (128, 256):
        m3 = native.plan_microrows3(nrows, ncols, rp, cols, window, ACC_GROUP)
        if m3 is None:
            m3 = _estimate_multi_numpy(rp, cols, window, nrows)
        for pair, m in zip((1, 2, 4), m3):
            t = m * STEP_COST[(window, pair)]
            if best is None or t < best[0]:
                best = (t, window, pair)
    return best[1], best[2]


def choose_window(rp, cols, ncols: int | None = None) -> int:
    """Window width of the cost-model-chosen layout (see
    :func:`choose_layout`)."""
    return choose_layout(rp, cols, ncols)[0]


def build_microblocks(
    csr, window: int | None = None, pair: int | None = None
) -> MicroBlockLayout:
    """Convert a CSR matrix into micro-block layout (device round-trip).

    For data that is already on the host, use
    :func:`build_microblocks_host` to avoid pulling device buffers back.
    """
    host = getattr(csr, "_host", None)
    if host is not None:
        rp, cis, vals = host
    else:
        rp = np.asarray(csr.rowptrs)
        cis = np.asarray(csr.colinds)
        vals = None if csr.values is None else np.asarray(csr.values)
    return build_microblocks_host(
        csr.nrows, csr.ncols, rp, cis, vals, window=window, pair=pair
    )


def build_microblocks_host(
    nrows, ncols, rp, cols, vals_in, *,
    window: int | None = None, pair: int | None = None,
) -> MicroBlockLayout:
    """Pack host CSR arrays into micro-block layout.

    Runs on the HOST: the packing is a static one-time preprocessing step
    (the analog of MKL handle creation, reference:
    csr/kernels/mkl/handle.py:61-70), and its scatters/sorts are
    host-shaped work — the exact access patterns the device kernel exists
    to avoid.  Only the final padded arrays ship to HBM.  The native C++
    path (csr_tpu/native, O(n) counting sorts) is ~10x the numpy path and
    is used whenever the library is available.

    ``window`` forces a window width (128/256) and ``pair`` a micro-row
    pairing multiple (1/2/4); by default both come from the measured cost
    model (:func:`choose_layout`).
    """
    nnz = int(len(cols))
    if nnz and (window is None or pair is None):
        w_, p_ = choose_layout(rp, cols, ncols)
        window = w_ if window is None else window
        pair = p_ if pair is None else pair
    window = LANE if window is None else window
    pair = 1 if pair is None else pair
    assert window in (128, 256), window
    assert pair in (1, 2, 4) and ACC_GROUP % pair == 0, pair
    if nnz:
        from csr_tpu import native

        built = native.build_microblocks(
            nrows, ncols, rp, cols, vals_in, MR_BLOCK, window, ACC_GROUP, pair
        )
        if built is not None:
            vals, meta, rbcb, m = built
            return MicroBlockLayout(
                nrows, ncols, nnz, m,
                jnp.asarray(vals), jnp.asarray(meta), jnp.asarray(rbcb),
                window, pair,
            )
    if nnz == 0:
        m_pad = MR_BLOCK
        return MicroBlockLayout(
            nrows, ncols, 0, 0,
            jnp.zeros((m_pad, LANE), jnp.float32),
            jnp.zeros((m_pad, LANE), jnp.uint16),
            jnp.zeros((m_pad,), jnp.int32),
            window, pair,
        )

    cols = np.asarray(cols).astype(np.int32, copy=False)
    if vals_in is None:
        vals_in = np.ones(nnz, np.float32)
    else:
        vals_in = np.asarray(vals_in).astype(np.float32, copy=False)

    shift = window.bit_length() - 1
    rp = np.asarray(rp)
    rids = np.repeat(np.arange(nrows, dtype=np.int32), np.diff(rp))
    rb = rids >> 7
    cb = cols >> shift

    # lexicographic (rb, cb, row): np.lexsort sorts by the LAST key primary
    perm = np.lexsort((rids, cb, rb))
    srid = rids[perm]
    scol = cols[perm]
    sval = vals_in[perm]
    srb = rb[perm]
    scb = cb[perm]

    # group = run of equal (rb, cb); packed position of each entry
    newgrp = np.empty(nnz, bool)
    newgrp[0] = True
    np.logical_or(srb[1:] != srb[:-1], scb[1:] != scb[:-1], out=newgrp[1:])
    grp_id = np.cumsum(newgrp) - 1
    idx = np.arange(nnz, dtype=np.int64)
    grp_first = np.maximum.accumulate(np.where(newgrp, idx, 0))
    pos = idx - grp_first

    mr_in_grp = pos // SLOT_CAP
    slot = (pos % SLOT_CAP).astype(np.int64)

    grp_sizes = np.bincount(grp_id)
    grp_mrs = -(-grp_sizes // SLOT_CAP)
    # pair mode: pad each group to a pair multiple so aligned pair-length
    # micro-row runs share one column window (build-loop address sharing)
    grp_mrs = -(-grp_mrs // pair) * pair
    n_grps = len(grp_sizes)
    grp_rb = srb[np.flatnonzero(newgrp)]
    grp_cb = scb[np.flatnonzero(newgrp)]

    # Stripes = runs of groups sharing one row window (rb).  Each stripe's
    # micro-row count is padded to a multiple of ACC_GROUP so that every
    # aligned ACC_GROUP-micro-row accumulation group has a UNIFORM rb: the
    # SpMV kernel then reduces a group's row sums with one sublane sum +
    # one dense add instead of ACC_GROUP scattered read-modify-writes.
    new_stripe = np.empty(n_grps, bool)
    new_stripe[0] = True
    new_stripe[1:] = grp_rb[1:] != grp_rb[:-1]
    stripe_id = np.cumsum(new_stripe) - 1
    n_stripes = int(stripe_id[-1]) + 1
    stripe_mrs = np.bincount(stripe_id, weights=grp_mrs).astype(np.int64)
    stripe_pad = -(-stripe_mrs // ACC_GROUP) * ACC_GROUP
    stripe_off = np.cumsum(stripe_pad) - stripe_pad

    grp_cum = np.cumsum(grp_mrs) - grp_mrs
    stripe_first_cum = grp_cum[np.flatnonzero(new_stripe)]
    grp_off_in_stripe = grp_cum - stripe_first_cum[stripe_id]
    grp_mr_off = stripe_off[stripe_id] + grp_off_in_stripe
    mr_idx = grp_mr_off[grp_id] + mr_in_grp

    m = int(stripe_pad.sum())
    m_pad = -(-m // MR_BLOCK) * MR_BLOCK

    vals = np.zeros((m_pad, LANE), np.float32)
    vals[mr_idx, slot] = sval
    lo = np.zeros((m_pad, LANE), np.int32)
    lo[mr_idx, slot] = scol & (window - 1)

    # stripe-padding micro-rows carry their stripe's rb (and cb 0, value 0)
    # so the per-vreg rb-uniformity invariant holds everywhere; group
    # micro-rows (incl. pair padding) carry the group's (rb, cb) so the
    # pair-uniform-cb invariant holds
    rbcb = np.zeros(m_pad, np.int32)
    stripe_rb = grp_rb[np.flatnonzero(new_stripe)].astype(np.int32)
    for s_ in range(n_stripes):
        rbcb[stripe_off[s_] : stripe_off[s_] + stripe_pad[s_]] = stripe_rb[s_] << 16
    mr_grp = np.repeat(np.arange(n_grps), grp_mrs)
    grp_mr_pos = np.repeat(grp_mr_off, grp_mrs) + (
        np.arange(len(mr_grp)) - np.repeat(grp_cum, grp_mrs)
    )
    rbcb[grp_mr_pos] = (grp_rb[mr_grp].astype(np.int32) << 16) | grp_cb[
        mr_grp
    ].astype(np.int32)
    if m_pad > m:
        rbcb[m:] = rbcb[m - 1] & ~np.int32(0xFFFF)

    lrow = (srid & (LANE - 1)).astype(np.int64)
    cnt = np.bincount(mr_idx * LANE + lrow, minlength=m_pad * LANE)
    epos = np.cumsum(cnt.reshape(m_pad, LANE), axis=1).astype(np.int32)

    epos_shift = 7 if window == LANE else 8
    meta = (lo | (epos << epos_shift)).astype(np.uint16)
    return MicroBlockLayout(
        nrows, ncols, nnz, m,
        jnp.asarray(vals), jnp.asarray(meta), jnp.asarray(rbcb),
        window, pair,
    )
