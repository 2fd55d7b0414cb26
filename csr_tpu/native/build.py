"""
On-demand build of the native host library.

Compiles ``csr_host.cpp`` into ``_csr_host.so`` next to this module with
g++, rebuilding when the source is newer than the cached library (the
role of the reference's invoke-driven cffi build, reference: tasks.py:24-55,
without requiring a separate build step).
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "csr_host.cpp")
LIB = os.path.join(_DIR, "_csr_host.so")


def ensure_built() -> str:
    """Build (if stale) and return the shared library path."""
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    # build into a temp file then atomically rename, so concurrent importers
    # never load a half-written library
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-std=c++17",
                "-shared", "-fPIC", SRC, "-o", tmp,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return LIB
