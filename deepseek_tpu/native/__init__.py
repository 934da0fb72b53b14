"""Native (C++/OpenMP) host-side components, loaded via ctypes.

Mirrors the reference's native runtime pieces (quantizer extension
quantizer.cpp, trie tokenizer tokenizer.cpp) without a pybind11 dependency:
shared libraries are built on demand with g++ and cached next to the
sources. Every native component has a pure-Python fallback; set
``DSEEK_NO_NATIVE=1`` to force the fallbacks.
"""

from deepseek_tpu.native import kquant_native  # noqa: F401
