"""Build-on-demand for the native shared libraries."""

from __future__ import annotations

import os
import subprocess
import threading
from typing import Optional

_SRC_DIR = os.path.dirname(__file__)
_BUILD_DIR = os.path.join(_SRC_DIR, "_build")
_LOCK = threading.Lock()


def build_shared_lib(src_name: str, lib_name: str,
                     extra_flags: Optional[list] = None) -> Optional[str]:
    """Compile ``src_name`` into ``_build/lib_name`` if needed.

    Returns the library path, or None when native build is disabled or the
    toolchain is unavailable.
    """
    if os.environ.get("DSEEK_NO_NATIVE") == "1":
        return None
    src = os.path.join(_SRC_DIR, src_name)
    out = os.path.join(_BUILD_DIR, lib_name)
    with _LOCK:
        if (os.path.exists(out)
                and os.path.getmtime(out) >= os.path.getmtime(src)):
            return out
        os.makedirs(_BUILD_DIR, exist_ok=True)
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
               "-march=native"] + (extra_flags or []) + [src, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            return None
        return out
