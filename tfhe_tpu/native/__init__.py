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


def _build(src: str, so: str) -> bool:
    """Compile `src` -> `so` atomically (temp file + rename) so a concurrent
    process can never dlopen a partially written .so."""
    tmp = f"{so}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, src],
            check=True, capture_output=True,
        )
        os.rename(tmp, so)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _needs_build(src: str, so: str) -> bool:
    """True if `so` is absent or staler than an *existing* source file.
    A packaged install may ship only the .so; never raise on a missing src."""
    if not os.path.exists(so):
        return os.path.exists(src)
    return os.path.exists(src) and os.path.getmtime(so) < os.path.getmtime(src)


def get_lib():
    """The loaded native library, or None (callers fall back to numpy)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if _needs_build(_SRC, _SO):
        if not _build(_SRC, _SO) and not os.path.exists(_SO):
            return None
    if not os.path.exists(_SO):
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


# ---------------------------------------------------------------------------
# BLS12-446 curve hot loops (zk/curve.py speed path)
# ---------------------------------------------------------------------------

_BLS_SO = os.path.join(_DIR, "libtfhe_bls446.so")
_BLS_SRC = os.path.join(_DIR, "bls446.c")

_bls_lib = None
_bls_tried = False

_u64p = ctypes.POINTER(ctypes.c_uint64)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def get_bls_lib():
    """The BLS12-446 native library, or None (callers fall back to the
    pure-Python curve)."""
    global _bls_lib, _bls_tried
    if _bls_lib is not None or _bls_tried:
        return _bls_lib
    _bls_tried = True
    if _needs_build(_BLS_SRC, _BLS_SO):
        if not _build(_BLS_SRC, _BLS_SO) and not os.path.exists(_BLS_SO):
            return None
    if not os.path.exists(_BLS_SO):
        return None
    try:
        lib = ctypes.CDLL(_BLS_SO)
        for pre in ("g1", "g2"):
            # a stale prebuilt .so (packaged install without sources, or a
            # failed rebuild falling back to the old artifact) may lack
            # exports: AttributeError must mean "no native path", not a
            # crash in every zk caller
            fp = getattr(lib, f"{pre}_fixed_powers")
            fp.argtypes = [_u64p, _u64p, ctypes.c_longlong, ctypes.c_int,
                           _u64p, _u8p]
            fp.restype = None
            ms = getattr(lib, f"{pre}_msm")
            ms.argtypes = [_u64p, _u8p, _u64p, ctypes.c_longlong, _u64p,
                           _u8p]
            ms.restype = None
        # pairing exports (absent in a stale prebuilt .so: hasattr-gated
        # at the call sites in zk/curve.py)
        if hasattr(lib, "pairing_product_is_one"):
            pp = lib.pairing_product_is_one
            pp.argtypes = [_u64p, _u8p, _u64p, _u8p, ctypes.c_longlong,
                           _u64p, ctypes.c_int, _u8p]
            pp.restype = ctypes.c_int
            pe = lib.pairing_eval
            pe.argtypes = [_u64p, _u64p, _u64p, ctypes.c_int, _u64p]
            pe.restype = ctypes.c_int
        _bls_lib = lib
    except (OSError, AttributeError):
        _bls_lib = None
    return _bls_lib
