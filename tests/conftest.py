"""
Test configuration (reference: conftest.py).

* Tests run on CPU by default with an 8-device virtual mesh
  (``--xla_force_host_platform_device_count=8``) so distributed row
  partitioning is exercised without a pod; Pallas kernels run in
  interpreter mode there (the analog of the reference's
  ``NUMBA_DISABLE_JIT`` CI pass, reference: .github/workflows/test.yml:72-80).
  Set ``CSR_TPU_TEST_DEVICE=tpu`` to run the suite on real hardware.
* The ``kernel`` fixture parameterizes kernel-dependent tests over every
  backend (reference: conftest.py:11-37).
"""

import os
import sys

if os.environ.get("CSR_TPU_TEST_DEVICE", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        )
    # jax may already be imported (site customization); its config defaults
    # are read lazily at first backend use, but the platform choice must be
    # overridden explicitly in that case.
    if "jax" in sys.modules:
        import jax

        jax.config.update("jax_platforms", "cpu")

# make the in-repo package importable when PYTHONPATH is owned by the env
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging

import pytest
from hypothesis import settings

logging.getLogger("jax").setLevel(logging.WARNING)

# The hypothesis suite jit-compiles tens of thousands of small programs
# in one process, and every loaded executable adds memory mappings; at
# the default vm.max_map_count (65530) the process runs out of map slots
# ~3/4 through a cold run and XLA SEGFAULTS at the next mmap (measured:
# /proc/<pid>/maps grew 8k -> 63k, then rc=139; crash sites wander
# between compile/serialize/deserialize because they are just the next
# mmap).  Raise the limit when we can; warn when we cannot.
def _ensure_map_count(minimum: int = 262144) -> None:
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            current = int(f.read())
        if current >= minimum:
            return
        with open(path, "w") as f:
            f.write(str(minimum))
    except (OSError, ValueError):
        import warnings

        warnings.warn(
            f"vm.max_map_count < {minimum} and could not be raised; a full"
            " cold suite run may exhaust memory maps and crash. Run"
            f" `sysctl -w vm.max_map_count={minimum}` as root.",
            stacklevel=1,
        )


_ensure_map_count()

# persistent compilation cache: property-based tests compile many small
# programs; caching them across runs keeps the suite fast
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

KERNELS = ["scipy", "xla", "pallas"]


@pytest.fixture(scope="module", params=KERNELS)
def kernel(request):
    """Parameterize a test over all kernel backends; pre-warms each kernel
    with a tiny handle round-trip (reference: conftest.py:22-37)."""
    from csr_tpu import CSR
    from csr_tpu.kernels import get_kernel, releasing, use_kernel

    k = get_kernel(request.param)
    with use_kernel(request.param):
        m = CSR.empty(1, 1)
        with releasing(k.to_handle(m), k) as h:
            k.from_handle(h)
        yield request.param


@pytest.fixture(scope="session")
def tmp_path_shared(tmp_path_factory):
    """Session-scoped tmp dir (hypothesis forbids function-scoped fixtures)."""
    return tmp_path_factory.mktemp("csr")


settings.register_profile("default", max_examples=50, deadline=None)
settings.register_profile("large", max_examples=5000, deadline=None)
settings.register_profile("fast", max_examples=50, deadline=None)
settings.register_profile("ci", max_examples=8, deadline=None)
settings.load_profile(os.environ.get("CSR_HYPOTHESIS_PROFILE", "default"))
