"""ctypes binding for the native chunk prefetcher (chunk_reader.cpp).

The shared object is compiled on first use with whatever C++ compiler is on
PATH and cached next to this file, keyed on a hash of the source — a rebuild
happens exactly when the source changes.  Everything degrades gracefully: if
no compiler is available (or the build/load fails), :func:`load_library`
returns ``None`` and callers fall back to a numpy-memmap reader with the same
semantics (pyloo_tpu/io.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import shutil
import subprocess
import tempfile
import threading

_log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "chunk_reader.cpp")
_lock = threading.Lock()
_lib: "ctypes.CDLL | None | bool" = False  # False = not attempted yet


def _source_tag() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _build(so_path: str) -> bool:
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        _log.info("no C++ compiler found; using the numpy fallback reader")
        return False
    # Build in a temp file and rename: concurrent processes race benignly.
    fd, tmp = tempfile.mkstemp(
        suffix=".so", dir=os.path.dirname(so_path)
    )
    os.close(fd)
    cmd = [
        cxx, "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", tmp,
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
        if proc.returncode != 0:
            _log.warning(
                "native chunk reader build failed (%s); using the numpy"
                " fallback reader:\n%s", cxx, proc.stderr.strip()[:2000],
            )
            return False
        os.replace(tmp, so_path)
        return True
    except (OSError, subprocess.TimeoutExpired) as exc:
        _log.warning("native chunk reader build failed: %s", exc)
        return False
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_library() -> "ctypes.CDLL | None":
    """The compiled chunk-reader library, or ``None`` if unavailable.

    Thread-safe and memoized (including a negative result, so a missing
    compiler is probed once per process).  Set ``PYLOO_TPU_NO_NATIVE=1`` to
    force the numpy fallback without attempting a build.
    """
    global _lib
    with _lock:
        if _lib is not False:
            return _lib
        if os.environ.get("PYLOO_TPU_NO_NATIVE"):
            _lib = None
            return None
        so_path = os.path.join(
            os.path.dirname(__file__), f"_chunk_reader_{_source_tag()}.so"
        )
        if not os.path.exists(so_path) and not _build(so_path):
            _lib = None
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError as exc:
            _log.warning("failed to load %s: %s", so_path, exc)
            _lib = None
            return None
        lib.cr_open.restype = ctypes.c_void_p
        lib.cr_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.cr_read.restype = ctypes.c_int64
        lib.cr_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.cr_close.restype = None
        lib.cr_close.argtypes = [ctypes.c_void_p]
        lib.cr_reads_issued.restype = ctypes.c_int64
        lib.cr_reads_issued.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib
