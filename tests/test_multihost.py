"""Multi-host initialization test: a real 2-process CPU cluster.

The reference has no distributed backend at all (SURVEY §5); the TPU
framework's obligation is ``jax.distributed.initialize``-based multi-host
operation.  This test launches two actual OS processes that form a JAX
CPU cluster (coordinator on localhost), build one global 2-device mesh,
run the shard_map SpMV over it, and each verify their local row shard —
the pattern that scales unchanged to a v5e pod slice.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from csr_tpu.parallel import init_distributed

ok = init_distributed(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
assert ok, "init_distributed skipped"

import jax
import jax.numpy as jnp

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

from csr_tpu import CSR
from csr_tpu.parallel import dist
from csr_tpu.parallel.partition import partition_rows
from jax.sharding import Mesh

rng = np.random.default_rng(42)  # same seed in both processes
import scipy.sparse as sps

m = sps.random(16, 12, 0.3, format="csr", random_state=rng, dtype=np.float32)
csr = CSR.from_scipy(m)
dh = partition_rows(csr, 2)
# read aux metadata while it is still process-local
nloc = np.asarray(dh.nrows_local)
off = np.asarray(dh.row_offset)
mesh = Mesh(np.asarray(jax.devices()), ("rows",))
d = dh.shard(mesh)

x = np.linspace(-1.0, 1.0, 12).astype(np.float32)
y = dist.spmv(d, jnp.asarray(x), mesh)

# each process checks its LOCAL shard against the dense oracle
ref = m.toarray() @ x
for shard in y.addressable_shards:
    s = shard.index[0].start or 0
    got = np.asarray(shard.data)[0, : int(nloc[s])]
    want = ref[int(off[s]) : int(off[s]) + int(nloc[s])]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

# transpose direction exercises a real cross-process psum
xt = np.asarray(jax.device_get(dist.spmv_t(d, y, mesh)))
np.testing.assert_allclose(xt, m.toarray().T @ ref, rtol=1e-4, atol=1e-4)
print(f"proc {jax.process_index()} OK")
"""


@pytest.mark.skipif(
    os.environ.get("CSR_TPU_NO_SUBPROC") == "1",
    reason="subprocess tests disabled",
)
def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one device per process; drop any virtual-device inflation
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # a CLEAN path: site hooks (e.g. a TPU-plugin sitecustomize) import
    # jax at interpreter start, which would initialize the backend before
    # jax.distributed.initialize can run
    env["PYTHONPATH"] = repo

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
