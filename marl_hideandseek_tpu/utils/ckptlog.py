"""Checkpoint record-log IO: ctypes binding to the native C++ runtime.

The record/replay transport (reference capability: raw Checkpoint streams
written by jax_infer.py:125 and replayed by viewer.cpp:13-26,186-217),
upgraded with framing + CRC32C integrity + random access in
native/ckptlog.cpp. Builds the shared library on demand with `make`; falls
back to a pure-Python implementation of the same file format when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import zlib
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libckptlog.so"))

_MAGIC = 0x4B434C48
_VERSION = 1
_HEADER = struct.Struct("<IIIIQQ")      # magic, ver, worlds, bytes, res, n
_FRAME = struct.Struct("<QII")          # index, crc, flags


def _crc32c(data: bytes) -> int:
    # Pure-Python Castagnoli CRC (table-driven), matching native/ckptlog.cpp.
    table = _crc32c_table()
    c = 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


_TABLE = None


def _crc32c_table():
    global _TABLE
    if _TABLE is None:
        t = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (0x82F63B78 ^ (c >> 1)) if (c & 1) else (c >> 1)
            t.append(c)
        _TABLE = t
    return _TABLE


def _load_native() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ckptlog_create.restype = ctypes.c_void_p
    lib.ckptlog_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                   ctypes.c_uint32]
    lib.ckptlog_append.restype = ctypes.c_int
    lib.ckptlog_append.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ckptlog_close_writer.argtypes = [ctypes.c_void_p]
    lib.ckptlog_open.restype = ctypes.c_void_p
    lib.ckptlog_open.argtypes = [ctypes.c_char_p]
    lib.ckptlog_num_frames.restype = ctypes.c_uint64
    lib.ckptlog_num_frames.argtypes = [ctypes.c_void_p]
    lib.ckptlog_num_worlds.restype = ctypes.c_uint32
    lib.ckptlog_num_worlds.argtypes = [ctypes.c_void_p]
    lib.ckptlog_frame_bytes.restype = ctypes.c_uint32
    lib.ckptlog_frame_bytes.argtypes = [ctypes.c_void_p]
    lib.ckptlog_read.restype = ctypes.c_int
    lib.ckptlog_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                 ctypes.c_char_p]
    lib.ckptlog_close_reader.argtypes = [ctypes.c_void_p]
    return lib


_LIB = None
_LIB_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_native()
        _LIB_TRIED = True
    return _LIB


class CkptLogWriter:
    """Append-only checkpoint log writer."""

    def __init__(self, path: str, num_worlds: int, frame_bytes: int):
        self.path = path
        self.num_worlds = num_worlds
        self.frame_bytes = frame_bytes
        lib = _lib()
        if lib is not None:
            self._h = lib.ckptlog_create(path.encode(), num_worlds,
                                         frame_bytes)
            self._native = self._h is not None
        else:
            self._native = False
        if not self._native:
            self._f = open(path, "wb")
            self._f.write(_HEADER.pack(_MAGIC, _VERSION, num_worlds,
                                       frame_bytes, 0, 0))
            self._n = 0

    def append(self, frame: np.ndarray):
        """frame: [num_worlds, frame_bytes] uint8."""
        buf = np.ascontiguousarray(frame, dtype=np.uint8).tobytes()
        assert len(buf) == self.num_worlds * self.frame_bytes
        if self._native:
            rc = _lib().ckptlog_append(self._h, buf)
            if rc != 0:
                raise IOError(f"ckptlog append failed: {rc}")
        else:
            self._f.write(_FRAME.pack(self._n, _crc32c(buf), 0))
            self._f.write(buf)
            self._n += 1

    def close(self):
        if self._native:
            _lib().ckptlog_close_writer(self._h)
        else:
            self._f.seek(0)
            self._f.write(_HEADER.pack(_MAGIC, _VERSION, self.num_worlds,
                                       self.frame_bytes, 0, self._n))
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class CkptLogReader:
    """Random-access checkpoint log reader with CRC verification."""

    def __init__(self, path: str):
        self.path = path
        lib = _lib()
        self._native = False
        if lib is not None:
            h = lib.ckptlog_open(path.encode())
            if h:
                self._h = h
                self._native = True
                self.num_frames = lib.ckptlog_num_frames(h)
                self.num_worlds = lib.ckptlog_num_worlds(h)
                self.frame_bytes = lib.ckptlog_frame_bytes(h)
                return
        with open(path, "rb") as f:
            hdr = _HEADER.unpack(f.read(_HEADER.size))
            if hdr[0] != _MAGIC:
                raise IOError(f"bad magic in {path}")
            self.num_worlds = hdr[2]
            self.frame_bytes = hdr[3]
            payload = self.num_worlds * self.frame_bytes
            self._offsets = []
            off = _HEADER.size
            f.seek(0, 2)
            end = f.tell()
            while off + _FRAME.size + payload <= end:
                self._offsets.append(off + _FRAME.size)
                off += _FRAME.size + payload
            self.num_frames = len(self._offsets)

    def read(self, idx: int) -> np.ndarray:
        """Returns [num_worlds, frame_bytes] uint8."""
        n = self.num_worlds * self.frame_bytes
        if self._native:
            out = ctypes.create_string_buffer(n)
            rc = _lib().ckptlog_read(self._h, idx, out)
            if rc == -2:
                raise IOError(f"CRC mismatch at frame {idx}")
            if rc != 0:
                raise IOError(f"read failed: {rc}")
            buf = out.raw
        else:
            with open(self.path, "rb") as f:
                f.seek(self._offsets[idx] - _FRAME.size)
                fh = _FRAME.unpack(f.read(_FRAME.size))
                buf = f.read(n)
                if _crc32c(buf) != fh[1]:
                    raise IOError(f"CRC mismatch at frame {idx}")
        return np.frombuffer(buf, np.uint8).reshape(
            self.num_worlds, self.frame_bytes)

    def close(self):
        if self._native:
            _lib().ckptlog_close_reader(self._h)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
