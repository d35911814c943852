"""Lazy build of the native loader shared library.

Compiled on first use with g++ (no pybind11/torch extension machinery --
the interface is plain C, consumed via ctypes). Falls back gracefully when
no toolchain is available.
"""
import os
import subprocess
import threading
from pathlib import Path

_SRC = Path(__file__).parent / 'loader.cpp'
_LIB = Path(__file__).parent / '_loader.so'
_lock = threading.Lock()
_failed = False


def library_path():
    """Build (if needed) and return the shared library path, or None"""
    global _failed
    if _failed:
        return None
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    with _lock:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
        try:
            tmp = _LIB.with_suffix('.so.tmp')
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-pthread',
                 '-std=c++17', str(_SRC), '-o', str(tmp)],
                check=True,
                capture_output=True,
                timeout=120)
            os.replace(tmp, _LIB)
            return _LIB
        except (OSError, subprocess.SubprocessError):
            _failed = True
            return None


if __name__ == '__main__':
    import sys

    path = library_path()
    print(f'native loader: {path}')
    sys.exit(0 if path else 1)
