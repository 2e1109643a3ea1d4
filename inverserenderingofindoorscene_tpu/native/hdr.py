"""ctypes bindings for the native RGBE decoder (rgbe_decode.c).

The shared library is compiled on first use with the system C compiler
(-O3) and cached next to the source; all entry points release the GIL
(plain ctypes calls), so BatchIterator's prefetch THREADS scale the
decode across cores — the role the reference fills with 8-16 DataLoader
worker processes (trainBRDF.py:136-137).

Falls back gracefully: ``native_available()`` is False when no compiler
is present, and callers (data/openrooms.py) keep the cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "rgbe_decode.c")
_LIB_PATH = osp.join(_HERE, "_librgbe.so")

# Must equal rgbe_abi_version() in rgbe_decode.c.  A cached .so from an
# older source (e.g. after a failed rebuild) is refused on mismatch
# rather than called through now-wrong argtypes.
_ABI = 2

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    # compile to a per-pid temp + atomic rename: concurrent builders
    # (e.g. forked data-loader worker processes) never see a torn .so
    tmp = f"{_LIB_PATH}.tmp.{os.getpid()}"
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-o", tmp, _SRC, "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _LIB_PATH)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # The .so is a build artifact (never checked in — git would not
        # preserve the mtimes this staleness check relies on).  Rebuild
        # when missing or older than the source; if the rebuild fails an
        # existing binary is still tried, but only accepted when its
        # embedded ABI version matches (below) — a stale binary with a
        # different exported surface is refused, not mis-called.
        stale = not osp.isfile(_LIB_PATH) or (
            osp.getmtime(_LIB_PATH) <= osp.getmtime(_SRC)
        )
        if stale and not _build() and not osp.isfile(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        try:
            abi = lib.rgbe_abi_version
        except AttributeError:
            return None  # pre-versioning binary: signatures unknown
        abi.restype = ctypes.c_long
        abi.argtypes = []
        if abi() != _ABI:
            return None
        lib.rgbe_dims.restype = ctypes.c_int
        lib.rgbe_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        lib.rgbe_decode_pooled.restype = ctypes.c_int
        lib.rgbe_decode_pooled.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_float,
        ]
        lib.rgbe_decode.restype = ctypes.c_int
        lib.rgbe_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_long,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_rgbe_pooled(path: str, rows: int, cols: int, eh0: int, ew0: int,
                       eh: int, ew: int, scale: float = 1.0) -> np.ndarray:
    """Decode a [rows*eh0, cols*ew0] RGBE file straight into the pooled
    [rows, cols, eh*ew, 3] float32 envmap tensor (channels in cv2's BGR
    order, matching the reference's un-flipped loadEnvmap).  ``scale`` is
    folded into the pooling weight (saves the 22 MB post-multiply the
    loader would otherwise do under the GIL).  Raises ValueError on
    malformed/mismatched files."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    with open(path, "rb") as f:
        buf = f.read()
    out = np.zeros((rows, cols, eh * ew, 3), np.float32)
    rc = lib.rgbe_decode_pooled(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, cols, eh0, ew0, eh, ew, float(scale),
    )
    if rc != 0:
        raise ValueError(f"rgbe_decode_pooled({path}) failed: {rc}")
    return out


def decode_rgbe(path: str) -> np.ndarray:
    """Full-resolution decode -> [H, W, 3] float32, BGR channel order
    (cv2.imread parity: byte * 2^(E-136), 0 when E == 0).

    Raises ValueError on malformed files — callers that must never fail
    should catch it and fall back to cv2.imread, the same contract as
    decode_rgbe_pooled's call site (data/openrooms.py)."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    with open(path, "rb") as f:
        buf = f.read()
    # size the output via the C parser (same header handling as the
    # decoders: arbitrary header length, -Y/+X resolution line)
    h_c, w_c = ctypes.c_long(), ctypes.c_long()
    if lib.rgbe_dims(buf, len(buf), ctypes.byref(h_c),
                     ctypes.byref(w_c)) != 0:
        raise ValueError(f"bad RGBE header in {path}")
    h, w = h_c.value, w_c.value
    if h <= 0 or w <= 0 or h * w > (1 << 30):
        raise ValueError(f"implausible RGBE dims {h}x{w} in {path}")
    out = np.empty((h, w, 3), np.float32)
    rc = lib.rgbe_decode(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w,
    )
    if rc != 0:
        raise ValueError(f"rgbe_decode({path}) failed: {rc}")
    return out
