"""Shared compile-and-load scaffold for the native host-path libraries.

Both native bindings (fast_csv, fast_png) compile their C++ source with g++
on first use, cache the .so next to the source, rebuild when the source is
newer, and permanently latch to the Python fallback on any failure.  That
logic lives here once so a fix to it applies to every binding.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional, Sequence


def repo_native_src(name: str) -> str:
    """Absolute path of `native/<name>` at the repo root."""
    return os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "native", name,
    )


class NativeLib:
    """Lazy loader: build (if stale) + dlopen + configure ctypes signatures.

    `configure(lib)` sets argtypes/restypes; any exception anywhere latches
    the loader to None so callers fall back to their pure-Python path once
    instead of retrying a doomed build per call.
    """

    def __init__(self, src: str, lib_path: str, extra_args: Sequence[str],
                 configure: Callable[[ctypes.CDLL], None]):
        self._src = src
        self._lib_path = lib_path
        self._extra_args = list(extra_args)
        self._configure = configure
        self._lock = threading.Lock()
        self._lib: Optional[ctypes.CDLL] = None
        self._failed = False

    def _build(self) -> bool:
        # build to a per-process temp name, then rename atomically: the lock
        # below is per-process, so concurrent processes (sweep workers) may
        # build simultaneously — a shared output path would interleave
        # writes and could leave a permanently corrupt .so with a fresh
        # mtime that never self-heals
        tmp = f"{self._lib_path}.build.{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", self._src,
                 *self._extra_args, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, self._lib_path)
            return True
        except Exception:
            try:
                os.remove(tmp)
            except OSError:
                pass
            return False

    def _load(self) -> ctypes.CDLL:
        lib = ctypes.CDLL(self._lib_path)
        self._configure(lib)
        return lib

    def get(self) -> Optional[ctypes.CDLL]:
        with self._lock:
            if self._lib is not None or self._failed:
                return self._lib
            try:
                stale = (not os.path.exists(self._lib_path)) or (
                    os.path.getmtime(self._lib_path)
                    < os.path.getmtime(self._src)
                )
                if stale and not self._build():
                    self._failed = True
                    return None
                try:
                    self._lib = self._load()
                except Exception:
                    # a present-but-unloadable .so (foreign arch, corrupt
                    # file) must not latch the fallback while the toolchain
                    # works — rebuild once and retry
                    if not self._build():
                        raise
                    self._lib = self._load()
            except Exception:
                self._failed = True
        return self._lib
