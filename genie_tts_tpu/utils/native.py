"""ctypes loader for the native audio library (native/genie_audio.cpp).

Builds the shared library on first use (g++, cached next to the source);
falls back to scipy implementations when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgenie_audio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:
        logger.info("native audio build unavailable (%s); using scipy fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ga_resample.restype = ctypes.c_int64
        lib.ga_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.ga_resample_out_len.restype = ctypes.c_int64
        lib.ga_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        lib.ga_float_to_pcm16.restype = None
        lib.ga_float_to_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16)]
        lib.ga_mix_to_mono.restype = None
        lib.ga_mix_to_mono.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        logger.info("native audio library loaded: %s", _LIB_PATH)
        return _lib


def _as_float_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Native polyphase resample; scipy fallback."""
    if sr_in == sr_out:
        return np.asarray(audio, np.float32)
    lib = get_lib()
    audio = np.ascontiguousarray(audio, np.float32)
    if lib is None:
        from ..ops.audio import resample_poly

        return resample_poly(audio, sr_in, sr_out)
    n_out = lib.ga_resample_out_len(len(audio), sr_in, sr_out)
    out = np.empty(n_out, np.float32)
    written = lib.ga_resample(_as_float_ptr(audio), len(audio), sr_in, sr_out,
                              _as_float_ptr(out), n_out)
    if written < 0:
        raise RuntimeError("native resample failed")
    return out[:written]


def float_to_pcm16(audio: np.ndarray) -> bytes:
    lib = get_lib()
    audio = np.ascontiguousarray(audio, np.float32)
    if lib is None:
        from .wavio import float_to_pcm16_bytes

        return float_to_pcm16_bytes(audio)
    out = np.empty(len(audio), np.int16)
    lib.ga_float_to_pcm16(_as_float_ptr(audio), len(audio),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out.tobytes()
