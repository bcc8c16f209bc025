"""Lazy g++ build + ctypes loader for the native components."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

_CACHE = {}
_DIR = os.path.dirname(os.path.abspath(__file__))


def load_native(name: str) -> Optional[ctypes.CDLL]:
    """Compile emloco_tpu/native/<name>.cpp to a cached .so and load it.
    Returns None when no toolchain is available (callers must fall back)."""
    if name in _CACHE:
        return _CACHE[name]
    src = os.path.join(_DIR, f"{name}.cpp")
    if not os.path.exists(src):
        _CACHE[name] = None
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), "emloco_native")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, f"{name}-{tag}.so")
    if not os.path.exists(so_path):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", so_path, src],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _CACHE[name] = None
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        lib = None
    _CACHE[name] = lib
    return lib
