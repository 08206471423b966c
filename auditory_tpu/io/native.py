"""ctypes bindings for the native IO library (csrc/auditory_io.cpp).

Build with ``make -C csrc`` (produces auditory_tpu/io/libauditory_io.so).
Falls back transparently to the pure-Python decoder in :mod:`.wav` when the
shared library is absent, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "available", "decode_batch", "decode_batch_i16", "has_i16", "wav_info",
    "STATUS_NAMES", "STATUS_NOT_I16",
]

STATUS_NAMES = {
    0: "ok",
    1: "open failed",
    2: "not a RIFF/WAVE file",
    3: "bad fmt chunk",
    4: "unsupported encoding",
    5: "truncated data",
    6: "file longer than buffer",
    7: "not representable as int16 (use the float path)",
}

#: decodable file whose samples need the float path (24/32-bit, float WAV)
STATUS_NOT_I16 = 7

_lib: Optional[ctypes.CDLL] = None
_tried = False
_has_i16 = False


def has_i16() -> bool:
    """Whether the loaded native library exposes the raw-int16 batch decode
    (rebuild with ``make -C csrc`` if not)."""
    _load()
    return _has_i16


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = os.path.join(os.path.dirname(__file__), "libauditory_io.so")
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        _bind_base(lib)
    except (OSError, AttributeError):
        # a stale/partial .so missing a BASE symbol must degrade to the
        # pure-Python fallback (available() -> False), not crash the run
        return None
    # the i16 entry point arrived later: a stale .so (built before it) must
    # degrade to the float path, not break the whole native decoder
    global _has_i16
    try:
        lib.auditory_wav_decode_batch_i16.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.auditory_wav_decode_batch_i16.restype = ctypes.c_int32
        _has_i16 = True
    except AttributeError:
        _has_i16 = False
    _lib = lib
    return lib


def _bind_base(lib: ctypes.CDLL) -> None:
    lib.auditory_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.auditory_wav_info.restype = ctypes.c_int32
    lib.auditory_wav_decode_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.auditory_wav_decode_batch.restype = ctypes.c_int32


def available() -> bool:
    return _load() is not None


def wav_info(path: str) -> Tuple[int, int, int, int]:
    """(sample_rate, channels, bit_depth, n_frames); raises on error."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C csrc)")
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    bd = ctypes.c_int32()
    nf = ctypes.c_int64()
    st = lib.auditory_wav_info(os.fsencode(path), sr, ch, bd, nf)
    if st != 0:
        raise IOError(f"{path}: {STATUS_NAMES.get(st, st)}")
    return sr.value, ch.value, bd.value, nf.value


def decode_batch(
    paths: Sequence[str],
    max_samples: int,
    channel: int = -1,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[Optional[str]]]:
    """Decode many WAVs in parallel (native threads).

    channel=-1 reproduces the reference SoundToTensor flattening
    (sound/sound.go:116-127); channel>=0 de-interleaves that channel.

    Returns (signals [n, max_samples] float32, lengths [n] int64,
    sample_rates [n] int32, errors [n] -- None when ok).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C csrc)")
    n = len(paths)
    # os.fsencode, not str.encode: surrogate-escaped (non-UTF-8)
    # filenames must reach fopen as their original filesystem bytes
    blob = b"\0".join(os.fsencode(p) for p in paths) + b"\0"
    # np.empty: the C workers memset every row before decoding into it
    out = np.empty((n, max_samples), dtype=np.float32)
    statuses = np.zeros(n, dtype=np.int32)
    lengths = np.zeros(n, dtype=np.int64)
    srs = np.zeros(n, dtype=np.int32)
    lib.auditory_wav_decode_batch(
        blob,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
        channel,
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    errors: List[Optional[str]] = [
        None if s == 0 else STATUS_NAMES.get(int(s), str(s)) for s in statuses
    ]
    return out, lengths, srs, errors


def decode_batch_i16(
    paths: Sequence[str],
    max_samples: int,
    channel: int = -1,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Raw-sample decode of 8/16-bit PCM WAVs: the integer samples as int16
    plus the reference normalization divisor per file
    (sound/sound.go:130-141), so the int->float divide runs on the
    accelerator after a half-size host->device transfer.

    Returns (signals [n, max_samples] int16, lengths [n] int64,
    sample_rates [n] int32, divisors [n] float32, statuses [n] int32).
    A status of :data:`STATUS_NOT_I16` means the file is fine but needs
    :func:`decode_batch` (24/32-bit or float WAV)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C csrc)")
    if not _has_i16:
        raise RuntimeError(
            "native IO library predates the int16 decoder; rebuild with "
            "make -C csrc"
        )
    n = len(paths)
    # os.fsencode, not str.encode: surrogate-escaped (non-UTF-8)
    # filenames must reach fopen as their original filesystem bytes
    blob = b"\0".join(os.fsencode(p) for p in paths) + b"\0"
    out = np.empty((n, max_samples), dtype=np.int16)  # C memsets rows
    statuses = np.zeros(n, dtype=np.int32)
    lengths = np.zeros(n, dtype=np.int64)
    srs = np.zeros(n, dtype=np.int32)
    divisors = np.zeros(n, dtype=np.float32)
    lib.auditory_wav_decode_batch_i16(
        blob,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        max_samples,
        channel,
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        divisors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out, lengths, srs, divisors, statuses
