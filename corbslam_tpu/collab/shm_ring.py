"""ctypes binding for the native shared-memory SPSC ring (native/shm_ring.cc).

The C++ side is the same-host transport lane of the runtime (the reference
runs its client<->server exchange through ROS1 TCPROS even on one host,
corbslam_server/src/main.cpp:49-55; here same-host frames move through an
mmap'd ring with atomic indices — no sockets on the hot path). This module
compiles the library on first use (g++ is part of the toolchain; the .so is
cached next to the source) and wraps it in a small Ring class.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LIB = None
_LIB_LOCK = threading.Lock()

_SRC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_SRC_DIR, "libshmring.so")


class ShmRingUnavailable(RuntimeError):
    pass


def _build() -> str:
    src = os.path.join(_SRC_DIR, "shm_ring.cc")
    if not os.path.exists(src):
        raise ShmRingUnavailable(f"missing {src}")
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO_PATH + ".tmp", src, "-lrt", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        raise ShmRingUnavailable(f"shm_ring build failed: {detail}") from e
    os.replace(_SO_PATH + ".tmp", _SO_PATH)
    return _SO_PATH


def _lib():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        path = _SO_PATH
        src = os.path.join(_SRC_DIR, "shm_ring.cc")
        if (not os.path.exists(path)
                or (os.path.exists(src)
                    and os.path.getmtime(src) > os.path.getmtime(path))):
            path = _build()
        lib = ctypes.CDLL(path)
        lib.csr_create.restype = ctypes.c_void_p
        lib.csr_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.csr_open.restype = ctypes.c_void_p
        lib.csr_open.argtypes = [ctypes.c_char_p]
        lib.csr_push.restype = ctypes.c_int
        lib.csr_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_uint32]
        lib.csr_pop.restype = ctypes.c_int64
        lib.csr_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_uint64]
        lib.csr_peek.restype = ctypes.c_int64
        lib.csr_peek.argtypes = [ctypes.c_void_p]
        lib.csr_used.restype = ctypes.c_uint64
        lib.csr_used.argtypes = [ctypes.c_void_p]
        lib.csr_close.restype = None
        lib.csr_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


class Ring:
    """One direction of a same-host channel (single producer, single
    consumer). `create=True` owns (and unlinks) the shm segment."""

    def __init__(self, name: str, capacity: int = 1 << 22,
                 create: bool = False):
        lib = _lib()
        self._lib = lib
        self.name = name
        if create:
            self._h = lib.csr_create(name.encode(), capacity)
        else:
            self._h = lib.csr_open(name.encode())
        if not self._h:
            raise ShmRingUnavailable(
                f"csr_{'create' if create else 'open'}({name}) failed")

    def push(self, data: bytes) -> bool:
        """False when the ring is full (caller retries); raises if the
        frame can never fit."""
        rc = self._lib.csr_push(self._h, data, len(data))
        if rc == -2:
            raise ValueError(f"frame of {len(data)} bytes exceeds ring capacity")
        return rc == 0

    def pop(self) -> bytes | None:
        n = self._lib.csr_peek(self._h)
        if n < 0:
            return None
        buf = ctypes.create_string_buffer(int(n))
        got = self._lib.csr_pop(self._h, buf, int(n))
        if got < 0:
            return None
        return buf.raw[:got]

    def used(self) -> int:
        return int(self._lib.csr_used(self._h))

    def close(self):
        if self._h:
            self._lib.csr_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            self.close()
        except Exception:
            pass


def available() -> bool:
    try:
        _lib()
        return True
    except ShmRingUnavailable:
        return False
