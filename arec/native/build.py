"""On-demand build of the native packer (g++ -O3 -shared -fPIC).

Rebuilds when the source is newer than the .so. Failure to build is
non-fatal: callers fall back to the numpy path (arec/native/__init__.py).
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "packer.cpp")
LIB = os.path.join(_DIR, "_libarecio.so")


def build(force: bool = False) -> str | None:
    """Returns the .so path, building if stale; None if the build fails."""
    try:
        if (not force and os.path.exists(LIB)
                and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
            return LIB
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-o", LIB, SRC]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return LIB
    except Exception:
        return None


if __name__ == "__main__":
    out = build(force=True)
    print(out or "BUILD FAILED")
