"""
Weak-scaling benchmark for the distributed micro-block SpMV.

For each device count D (1..#devices): a square matrix with rows
proportional to D (constant per-device work), row-partitioned over a
D-device mesh, halo-form SpMV (column-sharded operand, ``all_gather``
over ICI) chained K iterations inside one jitted ``fori_loop`` — each
shard's output is directly the next iteration's operand slice.

Prints one JSON line per D with nnz/s and efficiency vs D=1
(BASELINE.md: >=70% weak-scaling nnz/s efficiency target).

On this machine only one real TPU chip is reachable, so real-hardware
numbers exist for D=1; the same harness runs unchanged on a pod slice
(and on the CPU virtual mesh for plumbing validation:
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""

import argparse
import json
import time
from functools import partial

import numpy as np


def run(n_devices: int, rows_per_device: int, npr: int, k: int, reps: int,
        ring: bool = False):
    import jax
    import jax.numpy as jnp

    from csr_tpu import CSR
    from csr_tpu.parallel import mb_dist, mb_ring
    from csr_tpu.parallel.partition import make_mesh

    interpret = jax.default_backend() == "cpu"
    nrows = ncols = rows_per_device * n_devices
    nnz = nrows * npr
    rng = np.random.default_rng(0)
    rowptr = np.arange(nrows + 1, dtype=np.int64) * npr
    cols = rng.integers(0, ncols, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    csr = CSR(nrows, ncols, nnz, rowptr, cols, vals)

    mesh = make_mesh(n_devices)
    if ring:
        # ring schedule: per-step ppermute of the operand shard overlapped
        # with the held bucket's Pallas kernel (csr_tpu/parallel/mb_ring.py)
        rmb = mb_ring.partition_ring_mb(csr, n_devices).shard(mesh)
        assert rmb.rows_per_shard == rmb.cols_per_shard or n_devices == 1

        def step(xv):
            y = mb_ring.spmv_ring_mb(rmb, xv, mesh, interpret=interpret)
            y = y[:, : rmb.cols_per_shard]
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)

        x = rng.standard_normal(ncols).astype(np.float32)
        xs = mb_ring.scatter_x(rmb, x, mesh)
    else:
        dmb = mb_dist.partition_microblocks(csr, n_devices).shard(mesh)
        assert dmb.rows_per_shard == dmb.cols_per_shard, (
            "square uniform weak-scaling workload must tile evenly"
        )
        x = rng.standard_normal(ncols).astype(np.float32)
        xs = mb_dist.scatter_x(dmb, x, mesh)

        def step(xv):
            y = mb_dist.spmv_halo(dmb, xv, mesh, interpret=interpret)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)

    @partial(jax.jit, static_argnames="k")
    def chain(x0, k):
        return jax.lax.fori_loop(0, k, lambda i, xv: step(xv), x0)

    out = chain(xs, k)
    float(jnp.sum(out))  # warmup + compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(xs, k)
        s = float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / k)
        assert np.isfinite(s)
    return nnz, best


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-device", type=int, default=16384)
    ap.add_argument("--nnz-per-row", type=int, default=327)
    # each chain dispatch costs ~22 ms through the tunnel runtime
    # (docs/perf.md); iters must amortize it
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-devices", type=int, default=None)
    ap.add_argument("--ring", action="store_true",
                    help="ring schedule (ppermute overlap) instead of halo")
    args = ap.parse_args()

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:  # plumbing validation only: shrink
        args.rows_per_device = min(args.rows_per_device, 1024)
        args.nnz_per_row = min(args.nnz_per_row, 32)
        args.iters, args.reps = 2, 1

    n_dev = len(jax.devices())
    if args.max_devices:
        n_dev = min(n_dev, args.max_devices)
    base_rate = None
    d = 1
    while d <= n_dev:
        nnz, dt = run(d, args.rows_per_device, args.nnz_per_row,
                      args.iters, args.reps, ring=args.ring)
        rate = nnz / dt / 1e9
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "group": "WeakScaling-Ring" if args.ring else "WeakScaling",
            "devices": d, "nnz": nnz,
            "ms_per_iter": round(dt * 1e3, 3),
            "gnnz_per_s": round(rate, 3),
            "efficiency": round(rate / (base_rate * d), 4),
        }))
        d *= 2


if __name__ == "__main__":
    main()
