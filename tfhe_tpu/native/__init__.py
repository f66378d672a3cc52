"""Native (C, AES-NI) components, loaded via ctypes with build-on-demand.

The reference implements its CSPRNG in Rust with AES-NI
(tfhe-csprng/src/generators/implem/aesni); this is the equivalent native
engine for the host-side key/ciphertext generation hot loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtfhe_tpu_native.so")
_SRC = os.path.join(_DIR, "aes_ctr.c")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None (callers fall back to numpy)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.aes128_ctr_stream.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.aes128_ctr_stream.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def aes128_ctr_stream(key16: bytes, first_block: int, n_blocks: int):
    """Native keystream, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n_blocks * 16, dtype=np.uint8)
    lib.aes128_ctr_stream(
        key16, first_block, n_blocks,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.reshape(n_blocks, 16)
