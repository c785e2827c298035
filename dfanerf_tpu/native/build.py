"""Build-and-load for the C++ host extensions.

Compiles <name>.cpp next to this file into a shared library under
``~/.cache/dfanerf_tpu`` (keyed by source hash so edits rebuild) and loads
it with ctypes. No pybind11 dependency; plain extern-C ABI.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "dfanerf_tpu")
_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LOADED = {}


def load_library(name: str) -> ctypes.CDLL:
    """Compile (if needed) and load ``<name>.cpp`` as a shared library."""
    if name in _LOADED:
        return _LOADED[name]
    src = os.path.join(_SRC_DIR, f"{name}.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE, exist_ok=True)
    lib_path = os.path.join(_CACHE, f"{name}-{digest}.so")
    if not os.path.exists(lib_path):
        tmp = lib_path + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, lib_path)
    lib = ctypes.CDLL(lib_path)
    _LOADED[name] = lib
    return lib
