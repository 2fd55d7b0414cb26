"""Driver-entry integration tests.

The driver compile-checks ``__graft_entry__.entry()`` single-chip and runs
``dryrun_multichip(N)`` on an N-virtual-device CPU mesh.  Round 3 shipped a
green test suite alongside a dead driver path (a ``DistMicroBlock`` field was
added and the entry's construction fell out of sync) — these tests exist so
that can never happen again: the suite imports and runs both entry points on
the same virtual mesh the driver uses.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.ndim >= 1


def test_dryrun_multichip_virtual_mesh():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs the multi-device virtual mesh")
    graft.dryrun_multichip(n)
