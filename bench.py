"""
Flagship benchmark: micro-block Pallas SpMV at 10M+ nnz on one TPU chip.

Prints ONE JSON line:
    {"metric": "spmv_gbps", "value": <achieved GB/s>, "unit": "GB/s",
     "vs_baseline": <fraction of HBM-bandwidth roofline>}

``vs_baseline`` is achieved bandwidth / peak HBM bandwidth for the chip
(the reference publishes no absolute numbers — BASELINE.md — so the
roofline fraction is the baseline; the target is >= 0.8).

Methodology: K SpMV iterations chained inside one jitted ``fori_loop``
(output feeds the next input) with a host fetch at the end — per-call
``block_until_ready`` timing is unreliable through remote-tunnel TPU
runtimes, chained execution is not.  Bytes counted are the bytes the
kernel actually streams from HBM per iteration: the micro-block arrays
(6 B per padded slot); the dense operand and output stay VMEM-resident.
"""

import json
import sys
import time

import numpy as np


def detect_peak_gbps() -> float:
    """Peak HBM bandwidth by TPU generation (public figures)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v6e": 1638.0,  # Trillium
        "v6": 1638.0,
        "v5p": 2765.0,
        "v5 lite": 819.0,  # v5e
        "v5e": 819.0,
        "v4": 1228.0,
        "v3": 900.0,
        "v2": 700.0,
    }
    for key, bw in table.items():
        if key in kind:
            return bw
    return 819.0  # assume v5e-class if unknown


def main():
    import jax
    import jax.numpy as jnp

    from csr_tpu import CSR
    from csr_tpu.ops import microblock, spmv as spmv_op

    on_cpu = jax.default_backend() == "cpu"

    # 10.7M nnz: 32768 x 32768 at 327 nnz/row (density 0.01)
    nrows = ncols = 32768 if not on_cpu else 2048
    npr = 327 if not on_cpu else 32
    nnz = nrows * npr

    rng = np.random.default_rng(0)
    rowptr = np.arange(nrows + 1, dtype=np.int64) * npr
    cols = rng.integers(0, ncols, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    csr = CSR(nrows, ncols, nnz, rowptr, cols, vals)

    t0 = time.perf_counter()
    layout = microblock.build_microblocks(csr)
    jax.block_until_ready(layout.vals)
    prep_s = time.perf_counter() - t0

    m_pad = layout.vals.shape[0]
    rb_count = max(layout.rb_count, 1)
    cb_count = max(layout.cb_count, 1)

    x = rng.standard_normal(ncols).astype(np.float32)
    x_pad = jnp.asarray(
        np.pad(x, (0, cb_count * 128 - ncols)).reshape(cb_count, 128)
    )

    from functools import partial

    @partial(jax.jit, static_argnames="k")
    def chain(vals_a, meta, rbcb, x0, k):
        def body(i, xv):
            y = spmv_op._spmv_call(
                vals_a, meta, rbcb, xv, m_pad, rb_count, cb_count, on_cpu,
                wb=layout.window // 128, pair=layout.pair,
            )
            # feed output back (nrows == ncols) with a cheap normalization
            # so iterations are data-dependent and cannot be elided
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)

        return jax.lax.fori_loop(0, k, body, x0)

    # Each jitted chain invocation costs ~22 ms of dispatch/fetch through
    # the tunnel runtime regardless of K (measured: scratch/fixed_cost.py);
    # K must be large enough to amortize it below the noise floor.
    K = 300 if not on_cpu else 2
    reps = 3 if not on_cpu else 1
    out = chain(layout.vals, layout.meta, layout.rbcb, x_pad, K)
    float(jnp.sum(out))  # warmup + compile
    # The remote-tunnel runtime has substantial run-to-run variance; take
    # the best of several chained runs (standard min-of-reps timing).
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(layout.vals, layout.meta, layout.rbcb, x_pad, K)
        s = float(jnp.sum(out))  # host fetch forces completion
        dt = min(dt, (time.perf_counter() - t0) / K)
        assert np.isfinite(s)

    # bytes actually streamed from HBM per iteration: the micro-block
    # arrays only — the operand and output stay VMEM-resident across the
    # whole kernel (counting them would flatter GB/s by ~0.3%)
    stream = layout.nbytes
    gbps = stream / dt / 1e9
    peak = detect_peak_gbps() if not on_cpu else 100.0
    # supplemental standard SpMV accounting: bytes an ideal CSR kernel
    # would stream for the same problem (val+colind per nnz, rowptr, x, y)
    # — the cross-implementation "effective bandwidth" convention.  Unlike
    # the physical number it rewards padding reduction, not just speed.
    csr_bytes = nnz * 8 + (nrows + 1) * 4 + (nrows + ncols) * 4
    result = {
        "metric": "spmv_gbps",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "effective_csr_gbps": round(csr_bytes / dt / 1e9, 2),
        "gnnz_s": round(nnz / dt / 1e9, 2),
        "fill": round(layout.fill, 3),
    }
    print(
        f"# nnz={nnz} fill={layout.fill:.3f} prep={prep_s:.2f}s "
        f"t={dt*1e3:.3f}ms/iter nnz_rate={nnz/dt/1e9:.2f}Gnnz/s peak={peak}GB/s",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
